package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Value-bounded sliding-range aggregation as a difference of two
  * cumulative sums — the scale path behind `w5_range_prefix` /
  * `w6_range_avg`.
  *
  * Spark's sliding RANGE frame re-aggregates the whole frame per row
  * (its frame processors have no retract path), so
  * `sum(x) over (partition by p order by v range between W preceding
  * and current row)` costs O(rows × frame width), and frame width
  * grows with per-key history. This operator computes the identical
  * result from one GROWING frame, which Spark processes incrementally:
  *
  *   frame_sum(v) = cum(v' ≤ v, ties included) − cum(v' < v − W)
  *
  * Every row contributes two rows to a single window pass — a DATA row
  * at sort key 2·v+1 carrying its value, and a QUERY row at 2·(v−W)
  * carrying zero. The doubled keys keep the boundaries exact in
  * integer arithmetic: a query row's cumulative frame ends strictly
  * below any data tie at v−W (lower bound inclusive), a data row's
  * frame includes all of its own ties. A signed groupBy then collapses
  * each row's pair into cum_data − cum_query. Work is O(rows log rows)
  * in the partition sort, independent of frame width.
  *
  * Aggregate boundary: this prefix-difference trick covers exactly the
  * aggregates with a subtraction (group-inverse) law — SUM, COUNT
  * (sum of ones), and anything derived from them (AVG = sum/count,
  * population variance via sum + sum-of-squares + count). MIN/MAX have
  * no inverse: knowing min(prefix ≤ v) and min(prefix < v−W) says
  * nothing about the min of their difference-set, so a sliding-range
  * MIN/MAX needs a different structure (monotonic deque per partition,
  * inherently sequential per key) and is deliberately NOT offered here.
  */
object RangeSum {

  /** `outCol` = sum of `valCol` over rows of the same `partCol` whose
    * `valCol` lies in [v − width, v] (ties at both bounds per RANGE
    * semantics). `valCol` must be an integral column (exact keys);
    * `idCols` must identify rows uniquely. Output columns: idCols ++
    * partCol ++ outCol. */
  def slidingRangeSum(df: DataFrame, partCol: String,
      idCols: Seq[String], valCol: String, width: Long,
      outCol: String): DataFrame =
    slidingRangeSumCount(df, partCol, idCols, valCol, width,
      outCol, cntCol = null)

  /** Sum AND count over the same [v − width, v] frame in one window
    * pass (two running sums over the identical doubled-key union —
    * count is the sum of ones). `cntCol == null` keeps only the sum
    * (used by [[slidingRangeSum]]); callers wanting AVG divide the two
    * outputs — on the caller's side so the cast/rounding discipline
    * stays visible at the query. */
  def slidingRangeSumCount(df: DataFrame, partCol: String,
      idCols: Seq[String], valCol: String, width: Long,
      sumCol: String, cntCol: String): DataFrame = {
    val keep = (idCols :+ partCol).map(col)
    val internal = Seq("_rs_k", "_rs_v", "_rs_c", "_rs_sgn",
      "_rs_run", "_rs_crun")
    require(internal.forall(c => !df.columns.contains(c)),
      s"input must not carry ${internal.mkString(", ")}")
    // All key arithmetic in 64-bit: an IntegerType valCol would wrap
    // the DATA key (v*2+1 computed in 32-bit) for |v| > 2^30 while the
    // QUERY key promotes to long via the Long width literal — silently
    // corrupting the sort order (ADVICE r6).
    val v = col(valCol).cast("long")
    val data = df.select(
      keep :+ (v * 2 + 1).as("_rs_k") :+ v.as("_rs_v") :+
        lit(1L).as("_rs_c") :+ lit(1L).as("_rs_sgn"): _*)
    val queryPts = df.select(
      keep :+ ((v - width) * 2).as("_rs_k") :+
        lit(0L).as("_rs_v") :+ lit(0L).as("_rs_c") :+
        lit(-1L).as("_rs_sgn"): _*)
    val cum = Window.partitionBy(col(partCol)).orderBy(col("_rs_k"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val run = data.unionAll(queryPts)
      .withColumn("_rs_run", sum(col("_rs_v")).over(cum))
      .withColumn("_rs_crun", sum(col("_rs_c")).over(cum))
      .groupBy(keep: _*)
    if (cntCol == null)
      run.agg(sum(col("_rs_sgn") * col("_rs_run")).as(sumCol))
    else
      run.agg(sum(col("_rs_sgn") * col("_rs_run")).as(sumCol),
        sum(col("_rs_sgn") * col("_rs_crun")).as(cntCol))
  }
}
