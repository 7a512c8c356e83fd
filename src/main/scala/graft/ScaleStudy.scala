package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scaling study: replicate the sf0.1 tables N× in-plan (union of
  * re-scans with perturbed keys) and time the headline aggregation and
  * join at 1/2/4/8× to show the plans scale near-linearly on local[32].
  * Usage: sbt "runMain graft.ScaleStudy [maxFactor]"
  */
object ScaleStudy {

  private def replicate(df: DataFrame, n: Int, keyCols: Seq[String])
      : DataFrame =
    (0 until n).map { i =>
      keyCols.foldLeft(df)((d, k) =>
        d.withColumn(k, col(k) + lit(i.toLong * 100000000L)))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val maxFactor = if (args.nonEmpty) args(0).toInt else 8
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = "/root/testdata/sf0.1"

    def q1(li: DataFrame): Long =
      li.filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity".cast(DecimalType(38, 2))).as("q"),
          count(lit(1)).as("n"))
        .count()

    def j2(li: DataFrame, o: DataFrame): Long =
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(sum($"l_extendedprice".cast(DecimalType(38, 2))).as("rev"))
        .count()

    // warm
    q1(Tables.lineitem(spark, d))
    j2(Tables.lineitem(spark, d), Tables.orders(spark, d))

    var factor = 1
    while (factor <= maxFactor) {
      val li = replicate(Tables.lineitem(spark, d), factor,
        Seq("l_orderkey"))
      val o = replicate(Tables.orders(spark, d), factor, Seq("o_orderkey"))
      var t0 = System.nanoTime()
      q1(li)
      val tAgg = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      j2(li, o)
      val tJoin = (System.nanoTime() - t0) / 1e9
      println(f"""{"factor":$factor,"lineitem_rows":${600000L * factor},""" +
        f""""agg_sec":$tAgg%.2f,"join_sec":$tJoin%.2f}""")
      factor *= 2
    }
    spark.stop()
  }
}
