package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range / interval join via bucketing (SURVEY §2.4 "not present" row).
  *
  * A naive `a.join(b, a.ts BETWEEN b.lo AND b.hi)` plans as a
  * broadcast-nested-loop — O(|a|·|b|) comparisons. The scalable
  * composition bins both sides into fixed-width buckets of the range
  * dimension: an interval spanning k buckets is replicated k times, a
  * point lands in one bucket, and the join becomes an EQUI-join on
  * (key, bucket) followed by the exact predicate as a cheap filter.
  * Work is O(matches + replication), shuffles hash-partition on
  * (key, bucket) — the same trick Spark's own session windows and
  * interval-join implementations use.
  */
object RangeJoin {

  /** Join point rows to interval rows: same `keyCols`, and
    * pointCol ∈ [loCol, hiCol] (inclusive). `binWidth` must be ≥ the
    * typical interval width for low replication. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keyCols: Seq[String], pointCol: String, loCol: String,
      hiCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0)
    val p = points.withColumn("__bin",
      floor(col(pointCol) / binWidth))
    val i = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth),
        floor(col(hiCol) / binWidth))))
    p.join(i, keyCols :+ "__bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
