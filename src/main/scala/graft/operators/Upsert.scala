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
  * deltas accumulated. [[compact]] folds the log into a new base via a
  * Hadoop-`FileSystem` two-phase swap (write `base.tmp`, rename over
  * `base`, truncate log) — object-store-safe API, no `java.io.File`.
  *
  * Scale posture: append never reads existing data (O(delta)); snapshot
  * is one max_by groupBy keyed on the merge key; compaction cost equals
  * one snapshot + clustered write, amortized across the appends since
  * the last compact. Same-key-same-version duplicate rows (an
  * at-least-once replay) collapse to one deterministic winner because
  * max_by ties on the full (version, payload) struct. */
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

  /** Initialize (or replace) the base snapshot. */
  def writeBase(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(s"$dir/base")

  /** Append a delta batch: upserts and (if `tombstoneCol` is set on a
    * row) deletes. Never reads existing data. */
  def appendDelta(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Append).parquet(s"$dir/log")

  /** Merge-on-read reconstruction: the highest-`versionCol` row per
    * `keyCols`, tombstoned keys dropped. Base rows participate at
    * version -1 (any logged version wins over base). `tombstoneCol`
    * must be a boolean column present in both base and log (use
    * `lit(false)` when writing if deletes aren't used). */
  def snapshot(spark: SparkSession, dir: String, keyCols: Seq[String],
      versionCol: String, tombstoneCol: String = "_deleted")
      : DataFrame = {
    val basePath = new Path(s"$dir/base")
    val logPath = new Path(s"$dir/log")
    val parts = Seq(
      if (hasData(spark, basePath))
        Some(spark.read.parquet(basePath.toString)
          .withColumn(versionCol, lit(-1L)))
      else None,
      if (hasData(spark, logPath))
        Some(spark.read.parquet(logPath.toString))
      else None).flatten
    require(parts.nonEmpty, s"upsert table $dir has no base and no log")
    // allowMissingColumns: a base written before deletes were in use
    // lacks the tombstone column — null-filled, coalesced to false
    val all = parts.reduce(_.unionByName(_, allowMissingColumns = true))
    val payload = all.columns.filterNot(keyCols.contains)
    // max_by over the (version, payload…) struct: version decides,
    // payload breaks exact-duplicate ties deterministically
    val winner = all
      .groupBy(keyCols.map(col): _*)
      .agg(max(struct((versionCol +: payload.filterNot(_ == versionCol))
        .map(col): _*)).as("_w"))
    payload.foldLeft(winner) { case (d, c) =>
      d.withColumn(c, col("_w").getField(c))
    }.drop("_w")
      .filter(!coalesce(col(tombstoneCol), lit(false)))
  }

  /** Fold the log into a fresh base (copy-on-write compaction):
    * write `base.tmp`, swap via rename, drop the log. After compact,
    * [[snapshot]] reads only the new base. The rename-swap is the
    * standard object-store-safe two-phase commit; a reader racing the
    * swap sees either the old base+log or the new base — both yield
    * the same snapshot. Returns the compacted row count. */
  def compact(spark: SparkSession, dir: String, keyCols: Seq[String],
      versionCol: String, tombstoneCol: String = "_deleted"): Long = {
    val snap = snapshot(spark, dir, keyCols, versionCol, tombstoneCol)
      // compacted base re-enters future snapshots at version -1; the
      // stored version values are meaningless there, so reset to -1
      // and keep the tombstone column's shape for the next merge
      .withColumn(versionCol, lit(-1L))
    val tmp = new Path(s"$dir/base.tmp")
    val base = new Path(s"$dir/base")
    val log = new Path(s"$dir/log")
    snap.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val n = spark.read.parquet(tmp.toString).count()
    val f = fs(spark, base)
    if (f.exists(base)) f.delete(base, true)
    require(f.rename(tmp, base), s"rename $tmp -> $base failed")
    if (f.exists(log)) f.delete(log, true)
    n
  }
}
