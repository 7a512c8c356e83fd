package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.QueryStageExec

/** Execution-time scan auditing: run a query and read the partition-
  * pruning evidence off its OWN executed plan's scan metrics — the
  * ground truth the Spark UI shows, not an explain-string heuristic.
  * Static pruning shows as `numPartitions` == the selected count at
  * plan time; dynamic partition pruning (DPP) shows as the same metric
  * dropping below the partition total at RUNTIME (the scan's partition
  * list is re-filtered by the dim-side subquery result).
  *
  * Used by the partition_prune gate; generic over any partitioned
  * parquet-backed query. */
object ScanAudit {

  /** Fully execute `df` and count (shuffle exchanges, sort-merge
    * joins) in its final adaptive plan — the evidence a bucketed
    * (SMB) join needs: the join itself contributing ZERO exchanges.
    * Recurses through AQE query stages like
    * [[rowsAndPartitionsRead]]. */
  def exchangesAndMergeJoins(df: DataFrame): (Long, Int, Int) = {
    val rows = graft.Registry.force(df)
    val finalPlan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    def cnt(p: SparkPlan): (Int, Int) =
      p.collect {
        case q: QueryStageExec => cnt(q.plan)
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
          (1, 0)
        case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
          (0, 1)
      }.foldLeft((0, 0)) { case ((a, b), (c, d)) => (a + c, b + d) }
    val (ex, smj) = cnt(finalPlan)
    (rows, ex, smj)
  }

  /** Fully execute `df` (every row and column, same action as the
    * bench) and return (rows produced, partitions read) for the ONE
    * FileSourceScanExec whose root path contains `pathPart`.
    * Recurses through AQE query stages — after adaptive execution the
    * scans live inside QueryStageExec leaves, which `collect` alone
    * does not enter. */
  def rowsAndPartitionsRead(df: DataFrame, pathPart: String)
      : (Long, Long) = {
    val rows = graft.Registry.force(df)
    val finalPlan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    def scans(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case f: FileSourceScanExec => Seq(f)
        case q: QueryStageExec => scans(q.plan)
      }.flatten
    val matching = scans(finalPlan)
      .filter(_.relation.location.rootPaths.exists(
        _.toString.contains(pathPart)))
    require(matching.size == 1,
      s"expected exactly one scan of *$pathPart*, found ${matching.size}")
    val parts = matching.head.metrics.get("numPartitions")
      .map(_.value)
      .getOrElse(sys.error(
        s"scan of *$pathPart* has no numPartitions metric — " +
          "is the table actually partitioned?"))
    (rows, parts)
  }
}
