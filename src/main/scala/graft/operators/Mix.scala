package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and training-order shuffling.
  *
  * Both are pure column algebra over a seeded md5 of the document id:
  * no state, no RNG, no driver participation — the split/order of any
  * row is computable from (seed, id) alone, so it is stable across
  * engines, re-runs, partitionings, and cluster sizes. That property is
  * what makes a 100 TB split auditable: membership never depends on row
  * order or partition boundaries (contrast `randomSplit`, which
  * reshuffles membership whenever the partitioning changes).
  *
  * Training order at scale: `ORDER BY` [[shuffleKey]] and WRITE in that
  * order — the global sort is Spark's range-partitioned TeraSort shape,
  * already distributed. Materializing an explicit position is only
  * needed when a consumer demands it; do that with
  * [[Pack.withGlobalRank]] (two-phase prefix sum), never a
  * partition-less window.
  */
object Mix {

  /** Stable bucket in [0, buckets) from the md5 of the id text — the
    * ONE canonical spelling of the engine-exact bucket (every oracle
    * rebuilds it as `('0x' || substr(md5(..), 1, 8))::BIGINT % n`). */
  def hashBucket(id: Column, buckets: Int): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Seeded variant: bucket of "seed:id". */
  def hashBucket(id: Column, seed: String, buckets: Int = 100): Column =
    hashBucket(concat(lit(seed + ":"), id.cast("string")), buckets)

  /** train/val/test label: first `valPct` buckets of 100 → "val", next
    * `testPct` → "test", rest → "train". */
  def split(id: Column, seed: String, valPct: Int = 5,
      testPct: Int = 5): Column = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100)
    val b = hashBucket(id, seed, 100)
    when(b < valPct, "val")
      .when(b < valPct + testPct, "test")
      .otherwise("train")
  }

  /** Seeded shuffle key: ordering by it is a reproducible, uniform
    * permutation of the corpus (md5 is effectively a PRF of the id). */
  def shuffleKey(id: Column, seed: String): Column =
    md5(concat(lit(seed + "#"), id.cast("string")))

  /** Temperature-style source rebalancing: downsample every source
    * toward the smallest by inverse square root — source s with n_s
    * rows keeps each row with probability √(n_min/n_s), so expected
    * survivor counts are √(n_s·n_min), the geometric mean — exactly
    * the flattening a temperature-0.5 sampling mixture applies to a
    * skewed pretraining corpus (the dominant source is tempered, the
    * smallest kept whole).
    *
    * Everything is deterministic and engine-exact by construction:
    * membership is `hash_bucket(id) < floor(√(n_min/n_s)·2^20)`, where
    * the bucket is the seedless md5 bucket of the id and both √ and ÷
    * are single correctly-rounded IEEE-754 ops (this is WHY the
    * exponent is fixed at ½ — a general pow(n, α) differs by ulps
    * across libm implementations and would flip rows at the threshold;
    * callers needing other temperatures trade the exact oracle for a
    * statistical contract). No driver participation: one tiny
    * per-source aggregate, its global min broadcast back over it, and
    * a broadcast hash join onto the corpus scan — the big table is
    * touched once, map-side.
    */
  def temperatureResample(df: org.apache.spark.sql.DataFrame,
      sourceCol: String, idCol: String)
      : org.apache.spark.sql.DataFrame = {
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_source"))
    val thresholds = counts
      .crossJoin(broadcast(counts.agg(min(col("n_source")).as("n_min"))))
      .withColumn("keep_below",
        floor(sqrt(col("n_min").cast("double") /
          col("n_source").cast("double")) * (1 << 20)).cast("long"))
      .drop("n_min")
    df.join(broadcast(thresholds), sourceCol)
      .filter(hashBucket(col(idCol), 1 << 20) < col("keep_below"))
  }
}
