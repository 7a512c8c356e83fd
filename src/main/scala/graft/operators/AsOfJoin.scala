package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins — for each left row, the most recent right row of the
  * same key with rightTs ≤ leftTs (backward), or the earliest with
  * rightTs ≥ leftTs (forward; the two directions of pandas
  * merge_asof). Spark has no native as-of join; rather than a custom
  * physical operator, this composes built-ins the scalable way
  * (SURVEY §2.4 "not present" row; builder preference (a)): tag and
  * union both sides, then a single partitionBy(key).orderBy(ts)
  * window carries the nearest right payload into left rows. ONE
  * shuffle on the key, no range cross product, no per-key collect —
  * at 100 TB this is a sort within each key partition, exactly what a
  * native as-of operator would do. Both directions require the right
  * side to be unique per (key, ts) — at equal right timestamps the
  * carried payload is otherwise sort-nondeterministic (callers here
  * pre-aggregate, e.g. MAX(event_id) per ts).
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (its `payload` columns are carried)
    * @param keyCols   equi-key columns (same names both sides)
    * @param leftTs    ordering column on the left
    * @param rightTs   ordering column on the right
    * @param payload   right-side columns to attach (renamed as given)
    * @return left rows + payload of the as-of match; rows with no
    *         earlier right row are dropped (inner as-of semantics)
    */
  def asofBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val lAll = payload.foldLeft(l)((df, p) =>
      df.withColumn(s"__p_$p", lit(null)))
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
    val rAll = payload.foldLeft(r)((df, p) =>
      df.withColumn(s"__p_$p", col(p)))
    val unioned = lAll
      .select((keyCols ++ Seq("__ts", "__side")).map(col) ++
        leftCols.filterNot(keyCols.contains).map(c =>
          col(c).as(s"__l_$c")) ++
        payload.map(p => col(s"__p_$p")): _*)
      .unionByName(
        rAll.select((keyCols ++ Seq("__ts", "__side")).map(col) ++
          leftCols.filterNot(keyCols.contains).map(c =>
            lit(null).as(s"__l_$c")) ++
          payload.map(p => col(s"__p_$p")): _*))
    // right rows sort before left rows at equal ts → ≤ semantics
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned)((df, p) =>
      df.withColumn(s"__c_$p",
        last(col(s"__p_$p"), ignoreNulls = true).over(w)))
    carried
      .filter(col("__side") === 1 &&
        payload.map(p => col(s"__c_$p").isNotNull).reduce(_ && _))
      .select(keyCols.map(col) ++
        leftCols.filterNot(keyCols.contains).map(c =>
          col(s"__l_$c").as(c)) ++
        payload.map(p => col(s"__c_$p").as(p)): _*)
  }

  /** Forward as-of join — for each left row, the EARLIEST right row of
    * the same key with rightTs ≥ leftTs (pandas merge_asof
    * direction='forward'; ≥ is inclusive, mirroring backward's ≤).
    * Same union+window composition as [[asofBackward]], run over the
    * REVERSED ordering: under ORDER BY ts DESC (right before left at
    * equal ts), every right row at-or-after a left row precedes it,
    * and `last(ignoreNulls)` over the RUNNING [unbounded, current]
    * frame carries the nearest one — exactly the backward
    * construction mirrored. Deliberately NOT `first over [current,
    * unbounded following]`: Spark's UnboundedFollowing window frame
    * re-aggregates the entire remaining frame per row — O(n²) per
    * key (the resample_interp lesson, docs/PERF.md rescue #3) —
    * where the running frame is the one-pass incremental carry.
    * Identical scale shape to backward: one keyed shuffle, per-key
    * sort, no range product.
    *
    * @return left rows + payload of the as-of match; rows with no
    *         right row at-or-after them are dropped (inner semantics)
    */
  def asofForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val lAll = payload.foldLeft(l)((df, p) =>
      df.withColumn(s"__p_$p", lit(null)))
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
    val rAll = payload.foldLeft(r)((df, p) =>
      df.withColumn(s"__p_$p", col(p)))
    val unioned = lAll
      .select((keyCols ++ Seq("__ts", "__side")).map(col) ++
        leftCols.filterNot(keyCols.contains).map(c =>
          col(c).as(s"__l_$c")) ++
        payload.map(p => col(s"__p_$p")): _*)
      .unionByName(
        rAll.select((keyCols ++ Seq("__ts", "__side")).map(col) ++
          leftCols.filterNot(keyCols.contains).map(c =>
            lit(null).as(s"__l_$c")) ++
          payload.map(p => col(s"__p_$p")): _*))
    // descending ts; right rows (side 0) sort before left rows at
    // equal ts → ≥ semantics through a RUNNING frame
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned)((df, p) =>
      df.withColumn(s"__c_$p",
        last(col(s"__p_$p"), ignoreNulls = true).over(w)))
    carried
      .filter(col("__side") === 1 &&
        payload.map(p => col(s"__c_$p").isNotNull).reduce(_ && _))
      .select(keyCols.map(col) ++
        leftCols.filterNot(keyCols.contains).map(c =>
          col(s"__l_$c").as(c)) ++
        payload.map(p => col(s"__c_$p").as(p)): _*)
  }

  /** Nearest as-of join — for each left row, the right row of the same
    * key whose `rightTs` is CLOSEST to `leftTs` in either direction,
    * ties to the earlier (backward) match: pandas merge_asof
    * direction='nearest'. Composed as ONE union and ONE keyed
    * exchange carrying BOTH directional carries — the backward carry
    * over the ascending running frame and the forward carry over the
    * descending one (two Window nodes share the partitioning, so the
    * plan is Exchange → Sort(asc) → Window → Sort(desc) → Window: two
    * in-partition sorts, never a second shuffle, and both frames are
    * the O(n)-per-key running spelling — no UnboundedFollowing
    * re-aggregation). The nearer carry is chosen per row by exact
    * distance subtraction, so `leftTs`/`rightTs` must be NUMERIC
    * (callers convert timestamps to epoch micros first); at equal
    * distances the backward match wins, mirroring pandas.
    *
    * Output = left columns + chosen `payload` + `asof_dir` ('b'/'f')
    * + `asof_dist` (non-negative, in ts units). Left rows with no
    * right row on either side are dropped (inner semantics).
    */
  def asofNearest(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // the right timestamp rides along as one more carried payload so
    // the chooser can compute both distances row-locally
    val pAll = payload :+ "__rts"
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val lAll = pAll.foldLeft(l)((df, p) =>
      df.withColumn(s"__p_$p", lit(null)))
    val r = right
      .withColumn("__rts", col(rightTs))
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
    val rAll = pAll.foldLeft(r)((df, p) =>
      df.withColumn(s"__p_$p", col(p)))
    val unioned = lAll
      .select((keyCols ++ Seq("__ts", "__side")).map(col) ++
        leftCols.filterNot(keyCols.contains).map(c =>
          col(c).as(s"__l_$c")) ++
        pAll.map(p => col(s"__p_$p")): _*)
      .unionByName(
        rAll.select((keyCols ++ Seq("__ts", "__side")).map(col) ++
          leftCols.filterNot(keyCols.contains).map(c =>
            lit(null).as(s"__l_$c")) ++
          pAll.map(p => col(s"__p_$p")): _*))
    // ascending: right-before-left at equal ts → backward ≤ carry;
    // descending: right-before-left at equal ts → forward ≥ carry
    val wb = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // all backward carries first, then all forward: CollapseWindow
    // only merges ADJACENT same-spec windows, so interleaving b/f per
    // payload would plan 2·|payload| Window nodes (and sorts) where
    // grouping plans exactly two
    val withB = pAll.foldLeft(unioned)((df, p) =>
      df.withColumn(s"__b_$p",
        last(col(s"__p_$p"), ignoreNulls = true).over(wb)))
    val carried = pAll.foldLeft(withB)((df, p) =>
      df.withColumn(s"__f_$p",
        last(col(s"__p_$p"), ignoreNulls = true).over(wf)))
    val bTs = col("__b___rts")
    val fTs = col("__f___rts")
    val useB = bTs.isNotNull &&
      (fTs.isNull || (col("__ts") - bTs) <= (fTs - col("__ts")))
    carried
      .filter(col("__side") === 1 && (bTs.isNotNull || fTs.isNotNull))
      .select(keyCols.map(col) ++
        leftCols.filterNot(keyCols.contains).map(c =>
          col(s"__l_$c").as(c)) ++
        payload.map(p =>
          when(useB, col(s"__b_$p")).otherwise(col(s"__f_$p")).as(p)) ++
        Seq(when(useB, lit("b")).otherwise(lit("f")).as("asof_dir"),
          when(useB, col("__ts") - bTs)
            .otherwise(fTs - col("__ts")).as("asof_dist")): _*)
  }
}
