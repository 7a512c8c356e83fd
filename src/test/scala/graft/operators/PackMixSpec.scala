package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackMixSpec extends SparkSpec {
  import spark.implicits._

  test("global prefix sum: exclusive, total-order correct, and " +
      "invariant to partition count") {
    val df = Seq((1L, 4L), (2L, 10L), (3L, 3L), (4L, 15L), (5L, 0L))
      .toDF("id", "n")
    val expect = Map(1L -> 0L, 2L -> 4L, 3L -> 14L, 4L -> 17L, 5L -> 32L)
    for (parts <- Seq(1, 3, 32)) {
      val got = Pack.withGlobalPrefixSum(df, "id", "n", "p", parts)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("p"))
        .toMap
      assert(got == expect, s"numParts=$parts")
    }
  }

  test("global rank: 0-based dense order without a global window") {
    val df = Seq("c", "a", "b").toDF("k")
    val got = Pack.withGlobalRank(df, "k", "r").collect()
      .map(r => r.getAs[String]("k") -> r.getAs[Long]("r")).toMap
    assert(got == Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
  }

  test("packSequences: boundary-straddling docs split exactly, fill " +
      "report marks only the ragged tail non-full") {
    // token stream: doc1[0,4) doc2[4,14) doc3[14,17) doc4[17,32), L=10
    val docs = Seq((1L, 4), (2L, 10), (3L, 3), (4L, 15), (5L, 0))
      .toDF("doc_id", "n_tok")
    val packed = Pack.packSequences(docs, "doc_id", "n_tok", 10)
    val spans = packed.collect().map(r =>
      (r.getAs[Long]("seq_id"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("tok_start"), r.getAs[Long]("tok_end"))).toMap
    assert(spans == Map(
      (0L, 1L) -> (0L, 4L), (0L, 2L) -> (4L, 10L),
      (1L, 2L) -> (10L, 14L), (1L, 3L) -> (14L, 17L),
      (1L, 4L) -> (17L, 20L), (2L, 4L) -> (20L, 30L),
      (3L, 4L) -> (30L, 32L)))   // zero-token doc 5 absent
    val fill = Pack.sequenceFill(packed, 10).collect().map(r =>
      r.getAs[Long]("seq_id") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Boolean]("full"))).toMap
    assert(fill == Map(
      0L -> (2L, 10L, true), 1L -> (3L, 10L, true),
      2L -> (1L, 10L, true), 3L -> (1L, 2L, false)))
  }

  test("prefix-sum plan: windows are partitioned by _pid, never global") {
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "n")
    val plan = Pack.withGlobalPrefixSum(df, "id", "n", "p")
      .queryExecution.executedPlan.toString
    // every Window node must carry a partition spec — a global
    // ORDER-BY-only window would funnel the corpus through one task
    assert(!plan.contains("Window [") ||
      plan.linesIterator.filter(_.contains("Window"))
        .forall(_.contains("_pid")), plan)
  }

  test("hash split: deterministic, partition-invariant, ~90/5/5") {
    val ids = (0L until 2000L).toDF("id")
    val once = ids.select(col("id"), Mix.split(col("id"), "s1").as("sp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val again = ids.repartition(7)
      .select(col("id"), Mix.split(col("id"), "s1").as("sp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(once == again)
    val counts = once.values.groupBy(identity).view.mapValues(_.size)
    assert(math.abs(counts("val") - 100) < 60 &&
      math.abs(counts("test") - 100) < 60, counts.toMap.toString)
    // different seed → different membership
    val other = ids.select(col("id"), Mix.split(col("id"), "s2").as("sp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(once != other)
  }

  test("shuffle key: a permutation (all distinct), seed-sensitive") {
    val ids = (0L until 500L).toDF("id")
    val k1 = ids.select(Mix.shuffleKey(col("id"), "a").as("k"))
      .collect().map(_.getString(0))
    assert(k1.distinct.length == 500)
    val k2 = ids.select(Mix.shuffleKey(col("id"), "b").as("k"))
      .collect().map(_.getString(0))
    assert(!(k1 sameElements k2))
  }

  test("contamination: overlapping 5-grams flagged, disjoint and " +
      "short docs clean, eval side broadcast") {
    val eval = Seq((100L, "a b c d e f")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "z a b c d e x"),       // shares "a b c d e"
      (2L, "p q r s t u v"),       // disjoint
      (3L, "x y"))                 // < 5 tokens
      .toDF("doc_id", "text")
    val rep = Contamination.overlapReport(train, eval, "doc_id", "text")
    val got = rep.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_ngrams"), r.getAs[Long]("n_overlap"),
        r.getAs[Boolean]("contaminated"))).toMap
    assert(got == Map(
      1L -> (3L, 1L, true), 2L -> (3L, 0L, false),
      3L -> (0L, 0L, false)))
    val plan = rep.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("bloom decontamination == exact decontamination, with the " +
      "candidate test map-side (might_contain in the plan)") {
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory)
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val eval = docs.filter(col("doc_id") % 10 === 0)
    val exact = Contamination.overlapReport(train, eval, "doc_id", "text")
    val bloom = Contamination.bloomReport(train, eval, "doc_id", "text")
    // no false negatives + exact verify ⇒ bit-identical reports
    assert(bloom.exceptAll(exact).isEmpty && exact.exceptAll(bloom).isEmpty)
    // the bloom probe must be Spark's native runtime-filter expression,
    // not a UDF (asserted on its own frame: bloomReport localCheckpoints
    // the probe stage, so the final frame's plan no longer shows it)
    val filt = eval.stat.bloomFilter(xxhash64(col("text")), 100, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    filt.writeTo(bos)
    val probed = train.withColumn("cand",
      Contamination.bloomProbe(bos.toByteArray, col("text")))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(!plan.toLowerCase.contains("batchevalpython")
      && !plan.contains("ScalaUDF"), plan)
    // `*(n)` is the whole-stage-codegen marker in simple plan strings —
    // the probe row must be inside a codegen stage
    assert(plan.linesIterator.exists(l =>
      l.contains("might_contain") && l.trim.startsWith("*(")), plan)
    // and the probe itself has no false negatives
    assert(probed.filter(col("text").isin(
      eval.select("text").collect().map(_.getString(0)).toSeq: _*))
      .collect().forall(_.getAs[Boolean]("cand")))
  }

  test("bloom decontamination: an eval set with zero shared n-grams " +
      "flags nothing even with bloom false positives possible") {
    val eval = Seq((100L, "qq ww ee rr tt yy")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "z a b c d e x"),
      (3L, "x y")) // < 5 tokens
      .toDF("doc_id", "text")
    // fpp 0.5: half of all probes may be bloom-positive — the exact
    // verify stage must still zero them out
    val rep = Contamination.bloomReport(train, eval, "doc_id", "text",
      fpp = 0.5)
    val got = rep.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_ngrams"), r.getAs[Long]("n_overlap"),
        r.getAs[Boolean]("contaminated"))).toMap
    assert(got == Map(1L -> (3L, 0L, false), 3L -> (0L, 0L, false)))
  }

  test("repetition metrics: degenerate repeats fail the gate, varied " +
      "text passes, short docs don't divide by zero") {
    val docs = Seq(
      (1L, "x x x x x x"),                       // pure repetition
      (2L, "one two three four five six seven"), // varied
      (3L, "solo"))                              // no bigrams/5-grams
      .toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("top_bigram_frac"),
          r.getAs[Double]("dup_5gram_frac"),
          r.getAs[Boolean]("repetition_pass"))).toMap
    assert(m(1L) == ((1.0, 0.5, false)))
    // 6 distinct bigrams of 6 → 0.166667 ≤ 0.2, no dup 5-grams → passes
    assert(m(2L) == ((0.166667, 0.0, true)), m.toString)
    assert(m(3L) == ((0.0, 0.0, true)))
  }

  test("temperature resample: smallest source kept whole, big sources " +
      "tempered toward the geometric mean, membership deterministic") {
    import org.apache.spark.sql.functions._
    // 9:1 skew — big keeps each row w.p. √(100/900) = 1/3
    val df = spark.range(1000).select($"id".as("doc_id"),
      when($"id" < 900, "big").otherwise("small").as("src"))
    val kept = Mix.temperatureResample(df, "src", "doc_id").cache()
    val bySrc = kept.groupBy($"src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("small") == 100L, "smallest source must survive whole")
    // E[big] = 300; 4σ binomial band (σ = √(900·⅓·⅔) ≈ 14.1)
    assert(bySrc("big") > 240 && bySrc("big") < 360, bySrc.toString)
    // determinism + partition invariance: same membership at 1 partition
    val again = Mix.temperatureResample(df.repartition(1), "src",
      "doc_id").select("doc_id")
    assert(kept.select("doc_id").exceptAll(again).count() == 0)
    assert(again.exceptAll(kept.select("doc_id")).count() == 0)
    kept.unpersist()
  }
}
