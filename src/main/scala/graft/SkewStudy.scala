package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured skew-join study on a genuinely hot-keyed table (VERDICT r3
  * item 8 — SkewSpec proves result equivalence on benign data; this
  * main proves the PERFORMANCE claim on adversarial data).
  *
  * Data: a fact table where ONE key owns half of all rows (the viral-key
  * shape) with a ~100-byte payload so shuffle bytes track row counts,
  * and a 100-row dim table. Broadcast is disabled throughout — the
  * scenario salting exists for is "small side too large to broadcast",
  * and with broadcast on there is no shuffle to skew.
  *
  * Variants, each run twice (min reported):
  *   plain_noaqe  — SMJ, AQE skew handling OFF: the straggler baseline;
  *                  one shuffle partition carries 50% of the bytes.
  *   plain_aqe    — same join, AQE skewJoin ON (threshold lowered to
  *                  32 MB): the runtime re-plan splits the hot partition.
  *   salted       — operators/Skew.saltedJoin with 32 buckets: the
  *                  deterministic-layout fix; the hot key fans out over
  *                  32 partitions before the exchange.
  *
  * The joined result is aggregated over BOTH sides' payload columns so
  * column pruning cannot shrink the shuffled rows. Run:
  *   sbt "runMain graft.SkewStudy [nRows]"
  * Results are recorded in docs/PERF.md §skew. */
object SkewStudy {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = GraftSession.tuned(SparkSession.builder()
      .master("local[32]")
      .appName("graft-skew-study")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft-skew").toString
    // key 0 owns every even row = 50% of the table; the rest spread
    // over 99 tail keys. payload pads rows to ~100 B.
    spark.range(n).select(
        when(pmod($"id", lit(2)) === 0, 0L)
          .otherwise(pmod($"id", lit(100))).as("k"),
        $"id".as("v"),
        lpad(hex($"id"), 96, "x").as("payload"))
      .write.mode("overwrite").parquet(s"$dir/fact")
    spark.range(100).select($"id".as("k"),
        lpad(hex($"id"), 32, "d").as("name"))
      .write.mode("overwrite").parquet(s"$dir/dim")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim")

    // force the aggregate to consume both payloads → no pruning; a
    // global agg (not a same-key groupBy) so AQE is free to split the
    // join's partitioning
    var lastPlan = ""
    def consume(joined: DataFrame): Long = {
      val agg = joined.agg(sum(length($"payload") + length($"name")))
      // collect() (not head(): head spawns a separate CollectLimit
      // QueryExecution and the adaptive plan would never finalize)
      val r = agg.collect()(0).getLong(0)
      lastPlan = agg.queryExecution.executedPlan.toString
      r
    }

    def run(label: String)(body: => Long): Unit = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val r = body
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, r)
      }
      println(f"$label%-14s min=${times.map(_._1).min}%6.2f s " +
        f"(runs: ${times.map(t => f"${t._1}%.2f").mkString(", ")}; " +
        f"checksum=${times.head._2})")
    }

    def setCommon(): Unit = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    }

    setCommon()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    run("plain_noaqe") { consume(fact.join(dim, Seq("k"))) }

    setCommon()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32MB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32MB")
    run("plain_aqe") { consume(fact.join(dim, Seq("k"))) }
    println(s"plain_aqe skew-split applied: ${lastPlan.contains("skew=true")}")

    setCommon()
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    run("salted") {
      consume(operators.Skew.saltedJoin(fact, dim, Seq("k"), 32))
    }

    spark.stop()
  }
}
