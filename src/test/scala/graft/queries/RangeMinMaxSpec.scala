package graft.queries

import graft.{Registry, SparkSpec}

/** w7_range_minmax must equal the native sliding RANGE frame min/max
  * computed through a different plan: two block-partitioned growing
  * frames (see RangeSum.slidingRangeMinMax) instead of a sliding
  * frame that re-scans per row. First test pins value equality
  * against the native frame row-for-row; second pins that the w7
  * plan carries no sliding frame; third pins the boundary arithmetic
  * on an engineered fixture. */
class RangeMinMaxSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("w7_range_minmax == native sliding RANGE min/max row-for-row") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"cents").rangeBetween(-1000000L, 0L)
    val native = spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("cents", round($"o_totalprice" * 100).cast("long"))
      .select($"o_orderkey", $"o_orderpriority",
        (min($"cents").over(w).cast("double") / 100.0).as("nearby_min"),
        (max($"cents").over(w).cast("double") / 100.0).as("nearby_max"))
      .orderBy($"o_orderkey").collect()
    val w7 = Registry.queryMap("w7_range_minmax")(spark, sf)
      .collect()
    assert(native.length == w7.length && w7.length > 0)
    native.zip(w7).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0), s"key order: $a vs $b")
      assert(a.getString(1) == b.getString(1), s"priority: $a vs $b")
      // exact long cents divided once on both sides: bit-identical
      assert(a.getDouble(2) == b.getDouble(2), s"min: $a vs $b")
      assert(a.getDouble(3) == b.getDouble(3), s"max: $a vs $b")
    }
  }

  test("w7 plan: growing frames only — no sliding RANGE frame") {
    val p = Registry.queryMap("w7_range_minmax")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("unboundedpreceding$(), currentrow$()"),
      "expected cumulative [unbounded, current] frames:\n" + p)
    assert(!p.contains("-1000000"),
      "a sliding 10000-preceding frame survived the rewrite:\n" + p)
  }

  test("boundary exactness: ties included, inclusive lower bound") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // same engineered fixture as RangePrefixSpec. Frames:
    //   1.00     -> {1.00}                        min 1.00  max 1.00
    //   10000.00 -> {1.00, 10000.00}              min 1.00  max 10000.00
    //   10001.00 -> {1.00, 10000.00, 10001.00 x2} min 1.00  max 10001.00
    //               (1.00 == p-10000: INCLUSIVE lower bound)
    //   20001.00 -> {10001.00 x2, 20001.00}       min 10001.00 max 20001.00
    //               (10000.00 falls STRICTLY below 20001.00 - 10000)
    val rows = Seq((1L, 1.00), (2L, 10000.00), (3L, 10001.00),
      (4L, 10001.00), (5L, 20001.00))
      .toDF("o_orderkey", "o_totalprice")
      .withColumn("o_orderpriority", lit("P"))
    val dir = java.nio.file.Files.createTempDirectory("graft-w7").toString
    rows.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Registry.queryMap("w7_range_minmax")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(got == Map(
      1L -> (1.00, 1.00), 2L -> (1.00, 10000.00),
      3L -> (1.00, 10001.00), 4L -> (1.00, 10001.00),
      5L -> (10001.00, 20001.00)), got.toString)
  }
}
