package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance for keyed additive
  * aggregates (COUNT + SUM — the self-maintainable class): the view
  * is refreshed from a SIGNED delta batch (`op` = +1 insert / −1
  * retract) by aggregating the delta and merging it into the view
  * with one co-keyed full-outer join. Base fact rows are NEVER
  * rescanned — refresh cost is O(|delta| + |view|) with a keyed
  * shuffle of GROUP-cardinality rows, which at 100 TB is the entire
  * point: a day's delta against a year's facts touches the delta and
  * the (comparatively tiny) group table only. Updates are modeled the
  * classic way as retract+insert pairs; a group whose signed count
  * reaches 0 leaves the view, so from-scratch recompute over the
  * signed multiset is a pure SQL oracle for any refresh chain.
  *
  * Sums ride DECIMAL(38,12) (house float-sum rule): decimal addition
  * is exact and associative, so the incremental result is BIT-equal
  * to the from-scratch recompute — the oracle gate is an equality
  * proof of the maintenance algebra, not an approximation check.
  */
object IVM {

  /** Build the initial view from base facts (implicit op = +1).
    * Schema: keys ++ (n BIGINT, val_dec DECIMAL(38,12)). */
  def init(base: DataFrame, keys: Seq[String], valueCol: String)
      : DataFrame =
    base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(38,12)")).as("val_dec"))

  /** Merge one signed delta batch (`keys ++ (op INT ∈ {+1,−1},
    * valueCol)`) into a view produced by [[init]] or a prior
    * [[refresh]]. `value * op` flips sign exactly in double before
    * the decimal cast, so retracts cancel inserts bit-for-bit. */
  def refresh(view: DataFrame, delta: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame = {
    val dAgg = delta.groupBy(keys.map(col): _*)
      .agg(sum(col("op").cast("long")).as("_dn"),
        sum((col(valueCol) * col("op")).cast("decimal(38,12)"))
          .as("_dval"))
    view.join(dAgg, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("_dn"), lit(0L)))
          .as("n"),
        (coalesce(col("val_dec"), lit(0).cast("decimal(38,12)")) +
          coalesce(col("_dval"), lit(0).cast("decimal(38,12)")))
          .cast("decimal(38,12)").as("val_dec")): _*)
      .filter(col("n") > 0L)
  }
}
