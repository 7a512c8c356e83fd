package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated testdata tables (TESTDATA.md).
  *
  * All reads are plain parquet scans: schemas live in the files, and
  * Catalyst prunes columns / pushes predicates into the scan, which is
  * the behavior we want at 100 TB (only the referenced columns are read,
  * `PushedFilters` reach the footer/row-group level).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  /** Ensure at least cluster parallelism ahead of a generation-heavy
    * derivation (explode / shingle / trigram / vector encode): the
    * fixtures are single-row-group parquet files, so the scan stage —
    * and every partial aggregate or generator whole-stage-fused into
    * it — otherwise runs ONE task at any core count (guide §6:
    * row-group granularity bounds splitting; `minPartitionNum` cannot
    * split a single row group). The check makes it scale-honest: at
    * real corpus sizes the scan already has ≥ cluster-parallelism
    * splits and this is the identity — no corpus-wide shuffle is ever
    * added on a properly laid-out input. The pre-explode rows are the
    * cheap side to shuffle in any case (heavy derivation output stays
    * where it is produced). */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
