package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Entry-count note: BENCH carries two entries MORE than CORRECTNESS
  * (stream_fmgws / stream_tws, added in [[Bench.streamingLegs]]) —
  * oracle-less throughput legs over the stateful kernel that the
  * oracle-gated `stream_fold` query verifies bit-exactly; they time
  * the FMGWS-vs-TWS handler-API overhead, not a distinct semantics. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-way broadcast join + decimal-exact aggregation (SURVEY §2.4 J2). */
  def entry(spark: SparkSession): DataFrame =
    _root_.graft.queries.Core.j2_multi_join.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.queryMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.oracleMap
}
