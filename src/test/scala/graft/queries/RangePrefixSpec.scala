package graft.queries

import graft.{Registry, SparkSpec}

/** w5_range_prefix must be the same FUNCTION as w4_range_frame computed
  * through a different plan: a growing (incrementally processed)
  * cumulative frame over a union of data rows and query points, instead
  * of a sliding RANGE frame that re-aggregates per row. The first test
  * pins value equality row-for-row; the second pins that the w5 plan
  * really carries no sliding frame (the entire point of the rewrite). */
class RangePrefixSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("w5_range_prefix == w4_range_frame row-for-row") {
    val w4 = Registry.queryMap("w4_range_frame")(spark, sf).collect()
    val w5 = Registry.queryMap("w5_range_prefix")(spark, sf).collect()
    assert(w4.length == w5.length && w4.length > 0)
    w4.zip(w5).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0), s"key order: $a vs $b")
      assert(a.getString(1) == b.getString(1), s"priority: $a vs $b")
      // both sides sum exact long cents and divide once, so the
      // doubles must be bit-identical, not merely close
      assert(a.getDouble(2) == b.getDouble(2), s"total: $a vs $b")
    }
  }

  test("w5 plan: growing frame only — the sliding RANGE frame is gone") {
    val p = Registry.queryMap("w5_range_prefix")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("unboundedpreceding$(), currentrow$()"),
      "expected a cumulative [unbounded, current] frame:\n" + p)
    assert(!p.contains("-1000000"),
      "a sliding 10000-preceding frame survived the rewrite:\n" + p)
  }

  test("boundary exactness: ties included, strict lower bound") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // prices engineered around the 10000.00 window: 1.00, 10000.00,
    // 10001.00 (×2 ties), 20001.00. Frames ([p-10000, p], cents exact):
    //   1.00     -> {1.00}                            = 1.00
    //   10000.00 -> {1.00, 10000.00}                  = 10001.00
    //   10001.00 -> {1.00, 10000.00, 10001.00 ×2}     = 30003.00
    //               (1.00 == p-10000: INCLUSIVE lower bound; both ties)
    //   20001.00 -> {10001.00 ×2, 20001.00}           = 40003.00
    //               (10000.00 falls STRICTLY below 20001.00 - 10000)
    val rows = Seq((1L, 1.00), (2L, 10000.00), (3L, 10001.00),
      (4L, 10001.00), (5L, 20001.00))
      .toDF("o_orderkey", "o_totalprice")
      .withColumn("o_orderpriority", lit("P"))
    val dir = java.nio.file.Files.createTempDirectory("graft-w5").toString
    rows.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Registry.queryMap("w5_range_prefix")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got == Map(1L -> 1.00, 2L -> 10001.00, 3L -> 30003.00,
      4L -> 30003.00, 5L -> 40003.00), got.toString)
  }
}
