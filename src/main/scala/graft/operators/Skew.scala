package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling joins for hot keys (SURVEY §4.2 salting row; at 100 TB
  * a single viral key can put an entire shuffle partition on one
  * executor).
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default here) already splits oversized partitions at runtime
  * for sort-merge joins; explicit salting remains the tool when the
  * small side fits nowhere near memory or deterministic layout is
  * required. */
object Skew {

  /** Salted equi-join: the big side gets a deterministic salt derived
    * from its whole row (xxhash64 — cheap, codegen'd), the small side
    * is replicated once per salt bucket. Same result set as a plain
    * inner join on `keys`, but each hot key fans out over
    * `saltBuckets` shuffle partitions. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0)
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toSeq: _*), lit(saltBuckets))
        .cast("int"))
    val smallSalted = small.crossJoin(
      spark_range_df(small, saltBuckets))
    bigSalted.join(smallSalted, keys :+ "__salt", "inner")
      .drop("__salt")
  }

  private def spark_range_df(ref: DataFrame, n: Int): DataFrame =
    ref.sparkSession.range(n).select(col("id").cast("int").as("__salt"))

  /** Key-frequency report — find the candidates for salting before
    * paying for it. */
  def skewReport(df: DataFrame, keys: Seq[String], topN: Int = 20)
      : DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc)
      .limit(topN)
}
