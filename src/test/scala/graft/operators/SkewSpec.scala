package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain-join result under skew") {
    // hot key: 10k rows of key 1, a few of others
    val big = ((1 to 10000).map(i => (1L, i.toLong)) ++
      Seq((2L, 1L), (3L, 2L))).toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "warm"), (4L, "unmatched"))
      .toDF("k", "label")
    val plain = big.join(small, Seq("k"), "inner")
    val salted = Skew.saltedJoin(big, small, Seq("k"), saltBuckets = 8)
    assert(salted.count() == plain.count())
    assert(salted.select(sum($"payload")).as[Long].head() ==
      plain.select(sum($"payload")).as[Long].head())
    assert(salted.columns.sorted.toSeq == plain.columns.sorted.toSeq)
  }

  test("skew report surfaces the hot key first") {
    val df = ((1 to 500).map(_ => 7L) ++ (1 to 3).map(_.toLong))
      .toDF("k")
    val top = Skew.skewReport(df, Seq("k"), 1).collect().head
    assert(top.getAs[Long]("k") == 7L && top.getAs[Long]("n_rows") == 500L)
  }
}
