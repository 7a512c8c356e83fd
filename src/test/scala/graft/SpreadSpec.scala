package graft

import org.apache.spark.sql.functions._

/** r15: Tables.spread — the scan-parallelism lift ahead of
  * generation-heavy kernels (single-row-group fixture files plan one
  * scan partition; see Tables.spread's doc).
  */
class SpreadSpec extends SparkSpec {
  import spark.implicits._

  test("spread lifts an under-parallel frame to defaultParallelism " +
      "and preserves the row multiset exactly") {
    val p = spark.sparkContext.defaultParallelism
    val one = spark.range(0, 1000).coalesce(1).toDF("id")
    assert(one.rdd.getNumPartitions == 1)
    val spreadOut = Tables.spread(one)
    assert(spreadOut.rdd.getNumPartitions == p)
    assert(spreadOut.agg(count(lit(1)), sum($"id")).as[(Long, Long)]
      .head() == ((1000L, 499500L)))
  }

  test("spread is the identity on a frame already at or above " +
      "cluster parallelism (no shuffle added at real scale)") {
    val p = spark.sparkContext.defaultParallelism
    val wide = spark.range(0, 1000).repartition(p + 3).toDF("id")
    val out = Tables.spread(wide)
    assert(out.rdd.getNumPartitions == p + 3)
    // identity: no extra exchange in the plan beyond the one we added
    assert(out.queryExecution.executedPlan.toString
      .split("Exchange").length ==
      wide.queryExecution.executedPlan.toString.split("Exchange").length)
  }
}
