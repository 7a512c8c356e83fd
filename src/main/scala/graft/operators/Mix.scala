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

  /** Stable bucket in [0, buckets) from a seeded md5 of the id. */
  def hashBucket(id: Column, seed: String, buckets: Int = 100): Column =
    conv(substring(md5(concat(lit(seed + ":"), id.cast("string"))), 1, 8),
      16, 10).cast("long") % buckets

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
}
