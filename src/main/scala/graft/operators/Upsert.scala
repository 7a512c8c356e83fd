package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed MERGE/upsert over plain parquet, merge-on-read with explicit
  * compaction — the table-format-free answer to "the chemistry table
  * needs MERGE" (reference `metrics.py` rewrites its whole table per
  * run; Delta/Iceberg MERGE is the managed equivalent).
  *
  * Layout: `dir/base` (the last compacted snapshot) + `dir/log`
  * (append-only deltas). A delta row carries an explicit caller-supplied
  * `versionCol` (batch id / sequence number — NOT wall-clock, so
  * replays are idempotent) and an optional boolean tombstone column for
  * deletes. Readers reconstruct with [[snapshot]]: one keyed
  * aggregation taking the max-version row per key — the merge-on-read
  * shape whose cost is one shuffle of base+log, independent of how many
  * deltas accumulated.
  *
  * Idempotence across compaction: the compacted base RETAINS each row's
  * winning version and RETAINS tombstone rows (they are filtered from
  * the read view, not from storage). Resetting versions or dropping
  * tombstones would let an at-least-once replay of a pre-compaction
  * batch beat the compacted row and silently regress or resurrect data;
  * retained watermarks make the replay lose by version comparison,
  * exactly as it did before compaction. `purgeTombstones = true` drops
  * delete markers for space — only safe once upstream replays of older
  * batches are impossible.
  *
  * Scale posture: append never reads existing data (O(delta)); snapshot
  * is one max_by groupBy keyed on the merge key; compaction cost equals
  * one snapshot + write, amortized across the appends since the last
  * compact. Same-key-same-version duplicate rows (an at-least-once
  * replay) collapse to one deterministic winner because max_by ties on
  * the full (version, payload) struct. */
object Upsert {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def hasData(spark: SparkSession, p: Path): Boolean = {
    val f = fs(spark, p)
    f.exists(p) && f.listStatus(p).exists { s =>
      val n = s.getPath.getName
      n.endsWith(".parquet") || n.startsWith("part-")
    }
  }

  /** Initialize (or replace) the base snapshot. Rows without a version
    * column participate in merges at version -1 (any delta wins). */
  def writeBase(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(s"$dir/base")

  /** Append a delta batch: upserts and (if `tombstoneCol` is true on a
    * row) deletes. Never reads existing data. */
  def appendDelta(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Append).parquet(s"$dir/log")

  /** Winner-per-key reconstruction INCLUDING tombstone rows — the
    * storage view compaction persists. Base rows keep their stored
    * versions (a compacted base carries real watermarks); a base
    * written without `versionCol` joins at -1. */
  private def winners(spark: SparkSession, dir: String,
      keyCols: Seq[String], versionCol: String, tombstoneCol: String,
      maxVersion: Option[Long] = None): DataFrame = {
    val basePath = new Path(s"$dir/base")
    val tmpPath = new Path(s"$dir/base.tmp")
    val logPath = new Path(s"$dir/log")
    // crash/race recovery: between compact's two renames only base.tmp
    // exists, and it is always a COMPLETE snapshot (written before any
    // destructive step) — read it as the base
    val baseData =
      if (hasData(spark, basePath)) Some(basePath)
      else if (hasData(spark, tmpPath)) Some(tmpPath)
      else None
    val parts = Seq(
      baseData.map { p =>
        val b = spark.read.parquet(p.toString)
        if (b.columns.contains(versionCol)) b
        else b.withColumn(versionCol, lit(-1L))
      },
      if (hasData(spark, logPath))
        Some(spark.read.parquet(logPath.toString))
      else None).flatten
    require(parts.nonEmpty, s"upsert table $dir has no base and no log")
    // allowMissingColumns: a base written before deletes were in use
    // lacks the tombstone column — null-filled, coalesced to false
    val unioned = parts.reduce(_.unionByName(_, allowMissingColumns = true))
    // time travel: drop rows written after the as-of version; an
    // uncompacted base joined at -1 stays visible to every as-of
    val all = maxVersion
      .map(v => unioned.filter(col(versionCol) <= v))
      .getOrElse(unioned)
    val payload = all.columns.filterNot(keyCols.contains)
    val w = Iterator.from(0).map(i => if (i == 0) "_w" else s"_w$i")
      .find(n => !all.columns.contains(n)).get
    // max_by over the (version, payload…) struct: version decides,
    // payload breaks exact-duplicate ties deterministically
    val winner = all
      .groupBy(keyCols.map(col): _*)
      .agg(max(struct((versionCol +: payload.filterNot(_ == versionCol))
        .map(col): _*)).as(w))
    payload.foldLeft(winner) { case (d, c) =>
      d.withColumn(c, col(w).getField(c))
    }.drop(w)
  }

  /** Merge-on-read read view: the highest-`versionCol` row per
    * `keyCols`, tombstoned keys dropped. `tombstoneCol` must be a
    * boolean column on delta batches (use `lit(false)` when writing if
    * deletes aren't used). */
  def snapshot(spark: SparkSession, dir: String, keyCols: Seq[String],
      versionCol: String, tombstoneCol: String = "_deleted")
      : DataFrame =
    winners(spark, dir, keyCols, versionCol, tombstoneCol)
      .filter(!coalesce(col(tombstoneCol), lit(false)))

  /** Time travel: the table as of `version` — winner per key over rows
    * with `versionCol` ≤ version, tombstoned keys dropped (a key
    * deleted at v and re-inserted at v' > v is absent for
    * as-of ∈ [v, v') and back after — full lifecycle replay, not just
    * a filter on the latest state). EXACT while the log retains the
    * deltas; compaction folds history into single per-key winners, so
    * an as-of below the compaction watermark cannot be reconstructed
    * afterwards (the same contract as time travel over a vacuumed
    * log-structured table). An uncompacted base reads at version -1,
    * visible to every as-of. */
  def snapshotAsOf(spark: SparkSession, dir: String, keyCols: Seq[String],
      versionCol: String, version: Long,
      tombstoneCol: String = "_deleted"): DataFrame =
    winners(spark, dir, keyCols, versionCol, tombstoneCol, Some(version))
      .filter(!coalesce(col(tombstoneCol), lit(false)))

  /** Fold the log into a fresh base (copy-on-write compaction).
    * Swap protocol, object-store-safe Hadoop `FileSystem` calls only:
    * write the complete new base to `base.tmp` → rename `base` aside →
    * rename `base.tmp` into place → drop log → drop the old base.
    * Every crash/race window leaves a readable, consistent table:
    * before the swap readers see old base + log (the same merged
    * content); mid-swap [[snapshot]] falls back to the complete
    * `base.tmp`; after the swap but before log deletion the log rows
    * re-merge over the new base and win by their own versions —
    * yielding the values they already contributed. A compact that finds
    * a half-finished predecessor completes its swap first. Returns the
    * number of rows written (live + retained tombstones). */
  def compact(spark: SparkSession, dir: String, keyCols: Seq[String],
      versionCol: String, tombstoneCol: String = "_deleted",
      purgeTombstones: Boolean = false): Long = {
    val tmp = new Path(s"$dir/base.tmp")
    val base = new Path(s"$dir/base")
    val old = new Path(s"$dir/base.old")
    val log = new Path(s"$dir/log")
    val f = fs(spark, base)
    // finish a predecessor's interrupted swap, clear its leftovers
    if (!hasData(spark, base) && hasData(spark, tmp)) f.rename(tmp, base)
    if (f.exists(old)) f.delete(old, true)
    if (f.exists(tmp)) f.delete(tmp, true)
    val snap = winners(spark, dir, keyCols, versionCol, tombstoneCol)
    val kept =
      if (purgeTombstones)
        snap.filter(!coalesce(col(tombstoneCol), lit(false)))
      else snap
    kept.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val n = spark.read.parquet(tmp.toString).count()
    if (f.exists(base)) require(f.rename(base, old),
      s"rename $base -> $old failed")
    require(f.rename(tmp, base), s"rename $tmp -> $base failed")
    if (f.exists(log)) f.delete(log, true)
    if (f.exists(old)) f.delete(old, true)
    n
  }
}
