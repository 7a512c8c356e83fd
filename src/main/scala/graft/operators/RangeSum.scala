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
  * nothing about the min of their difference-set — so they take a
  * different decomposition, [[slidingRangeMinMax]] below: an integral
  * frame width W buckets values into width-W blocks, the frame
  * [v−W, v] then spans exactly two adjacent blocks, and each block
  * half is a GROWING running min/max Spark processes incrementally.
  * Same O(rows log rows) bound, no per-row frame re-aggregation.
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

  /** MIN and MAX of `valCol` over rows of the same `partCol` whose
    * `valCol` lies in [v − width, v] (ties at both bounds per RANGE
    * semantics), without sliding-frame re-aggregation and without the
    * (nonexistent) subtraction law the prefix kernel needs.
    *
    * Block decomposition: bucket values into width-sized blocks
    * b = ⌊v/W⌋. The frame [v−W, v] spans exactly blocks {b−1, b} —
    * ⌊(v−W)/W⌋ = ⌊v/W⌋ − 1 identically for integral W — so
    *
    *   frame_max(v) = max( ascMax_b(v), descMax_{b−1}(v−W) )
    *
    * (min symmetric): ascMax is the ascending running max within a
    * block (values ≤ v, ties included) read at the data row itself;
    * descMax is the descending running max within a block (values ≥
    * v−W, ties included) read at a PROBE row injected at sort value
    * v−W into block b−1. Probes contribute no value, so a probe's
    * running extreme is exactly the prev-block portion of the frame —
    * null when that portion is empty, dropped by the final null-
    * skipping min/max re-group. Both windows are GROWING frames Spark
    * processes incrementally; work is O(rows log rows) in two block-
    * partitioned sorts, independent of frame width. Block arithmetic
    * is exact for negatives too: the non-negative `pmod` remainder is
    * stripped first, making `DIV`'s truncation equal floor division.
    *
    * `valCol` must be non-null integral; `idCols` must identify rows
    * uniquely. Output columns: idCols ++ partCol ++ minCol ++ maxCol.
    */
  def slidingRangeMinMax(df: DataFrame, partCol: String,
      idCols: Seq[String], valCol: String, width: Long,
      minCol: String, maxCol: String): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    val keep = (idCols :+ partCol).map(col)
    val internal = Seq("_rm_bv", "_rm_b", "_rm_v", "_rm_c", "_rm_p",
      "_rm_mx", "_rm_mn")
    require(internal.forall(c => !df.columns.contains(c)),
      s"input must not carry ${internal.mkString(", ")}")
    val v = col(valCol).cast("long")
    val base = df
      .withColumn("_rm_bv", v - pmod(v, lit(width)))
      .withColumn("_rm_b", expr(s"_rm_bv DIV ${width}L"))
    val data = base.select(
      keep :+ v.as("_rm_v") :+ col("_rm_b") :+ v.as("_rm_c") :+
        lit(0).as("_rm_p"): _*)
    val probes = base.select(
      keep :+ (v - width).as("_rm_v") :+ (col("_rm_b") - 1)
        .as("_rm_b") :+ lit(null).cast("long").as("_rm_c") :+
        lit(1).as("_rm_p"): _*)
    val block = Seq(col(partCol), col("_rm_b"))
    val asc = Window.partitionBy(block: _*).orderBy(col("_rm_v"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val desc = Window.partitionBy(block: _*)
      .orderBy(col("_rm_v").desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    // own-block half, read at each data row (probes excluded — their
    // sort value v−W never lands in block b, but keeping them out of
    // this pass entirely is free)
    val own = data.select(
      keep :+ max(col("_rm_c")).over(asc).as("_rm_mx") :+
        min(col("_rm_c")).over(asc).as("_rm_mn"): _*)
    // prev-block half, read at each probe row over data ∪ probes
    val prev = data.unionAll(probes).select(
      keep :+ col("_rm_p") :+ max(col("_rm_c")).over(desc)
        .as("_rm_mx") :+ min(col("_rm_c")).over(desc).as("_rm_mn"): _*)
      .where(col("_rm_p") === 1)
      .select(keep :+ col("_rm_mx") :+ col("_rm_mn"): _*)
    own.unionAll(prev).groupBy(keep: _*)
      .agg(min(col("_rm_mn")).as(minCol), max(col("_rm_mx")).as(maxCol))
  }
}
