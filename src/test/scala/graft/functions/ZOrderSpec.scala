package graft.functions

import graft.SparkSpec
import graft.operators.Layout
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference morton interleave on the driver, bit by bit. */
  private def mortonRef(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("mortonCode matches the bit-by-bit reference over edge values") {
    val edges = Seq(0L, 1L, 2L, 3L, 7L, 31L, 1000L, 65535L, 65536L,
      (1L << 30) - 1, 1L << 30, (1L << 31) - 1)
    val rows = for (a <- edges; b <- edges) yield (a, b)
    val got = rows.toDF("a", "b")
      .withColumn("z", ZOrderCols.mortonCode($"a", $"b"))
      .orderBy($"a", $"b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, z) =>
      assert(z == mortonRef(a, b), s"morton($a,$b)")
      assert(z >= 0L, s"morton($a,$b) must stay non-negative")
    }
  }

  test("mortonCode is monotone per dimension with the other fixed") {
    // with b fixed, increasing a must increase z (curve order respects
    // each axis independently) — the property that makes per-file
    // min/max envelopes meaningful on both dimensions
    val df = spark.range(1 << 12).select(
      ($"id" % 64).as("a"), expr("id DIV 64").as("b"))
      .withColumn("z", ZOrderCols.mortonCode($"a", $"b"))
    val violations = df.as[(Long, Long, Long)].collect()
      .groupBy(_._2).values.map { rows =>
        val sorted = rows.sortBy(_._1).map(_._3)
        sorted.zip(sorted.tail).count { case (x, y) => x >= y }
      }.sum
    assert(violations == 0, s"$violations monotonicity violations")
  }

  test("zorderWrite files carry narrow envelopes on BOTH dimensions") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-zspec").toString
    // 64x64 uniform grid, 4 rows per cell
    val df = spark.range(16384).select(
      ($"id" % 64).as("a"), (expr("id DIV 64") % 64).as("b"))
    val lin = s"$base/lin"; val zd = s"$base/z"
    Layout.clusteredWrite(df, lin, targetRowsPerFile = 512,
      clusterCols = Seq("a"))
    Layout.zorderWrite(df, zd, targetRowsPerFile = 512, "a", "b")
    def meanSpanB(path: String): Double = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name()).agg(
          (max($"b") - min($"b")).as("span"))
        .collect().map(_.getAs[Long]("span"))
      spans.sum.toDouble / spans.length
    }
    // the 1-D layout is blind to b: every file spans ~the full b range;
    // the z layout tiles the plane, so per-file b spans shrink
    val linB = meanSpanB(lin); val zB = meanSpanB(zd)
    assert(zB < linB / 2,
      s"z layout should halve per-file b spans: lin=$linB z=$zB")
    assert(spark.read.parquet(zd).count() == 16384)
  }
}
