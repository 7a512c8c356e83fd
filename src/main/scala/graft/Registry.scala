package graft

/** Aggregates every declared query. SparkEntry derives its maps from
  * this single list. */
object Registry {
  def all: Seq[GQuery] =
    queries.Core.all ++ queries.Pipeline.all ++ queries.Extras.all ++
      queries.Relational.all ++ queries.Streaming.all ++
      queries.Retrieval.all ++ queries.Graph.all ++ queries.Prep.all ++
      queries.Analytics.all

  def queryMap: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleMap: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> normalize(o))).toMap

  /** Collapse the triple-quoted indentation into single-line SQL. */
  private def normalize(sql: String): String =
    sql.linesIterator.map(_.trim).filter(_.nonEmpty).mkString(" ")

  /** Materialize EVERY output row and column of a query — the honest
    * benchmark action. `df.count()` is NOT: Catalyst optimizes the
    * count, and for report-shaped queries (base table left-joined with
    * unique-keyed aggregates, e.g. decontaminate) it ELIMINATES the
    * joins entirely — the "benchmark" then times a metadata-only scan
    * while Verify pays the real cost. `toRdd.count()` executes the
    * query's own optimized plan as-is: every output row is produced
    * with all columns, nothing is re-planned around the action. */
  def force(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()
}
