package graft

/** Aggregates every declared query. SparkEntry derives its maps from
  * this single list. */
object Registry {
  def all: Seq[GQuery] =
    queries.Core.all ++ queries.Pipeline.all ++ queries.Extras.all ++
      queries.Relational.all ++ queries.Streaming.all

  def queryMap: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleMap: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> normalize(o))).toMap

  /** Collapse the triple-quoted indentation into single-line SQL. */
  private def normalize(sql: String): String =
    sql.linesIterator.map(_.trim).filter(_.nonEmpty).mkString(" ")
}
