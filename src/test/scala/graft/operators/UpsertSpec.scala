package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString

  private def snapMap(dir: String) =
    Upsert.snapshot(spark, dir, Seq("k"), "v").collect()
      .map(r => r.getAs[String]("k") -> r.getAs[Long]("x")).toMap

  test("merge-on-read: updates win by version, inserts appear, " +
      "tombstones delete, base rows survive untouched keys") {
    val dir = tmpDir("graft-upsert") + "/t"
    Upsert.writeBase(Seq(("a", 1L, false), ("b", 2L, false))
      .toDF("k", "x", "_deleted"), dir)
    Upsert.appendDelta(Seq(
      ("a", 10L, 1L, false),   // update a
      ("c", 30L, 1L, false))   // insert c
      .toDF("k", "x", "v", "_deleted"), dir)
    Upsert.appendDelta(Seq(
      ("a", 100L, 2L, false),  // later update wins
      ("b", 0L, 2L, true))     // delete b
      .toDF("k", "x", "v", "_deleted"), dir)
    assert(snapMap(dir) == Map("a" -> 100L, "c" -> 30L))
  }

  test("at-least-once replay of the same delta version is idempotent") {
    val dir = tmpDir("graft-upsert") + "/t"
    Upsert.writeBase(Seq(("a", 1L, false)).toDF("k", "x", "_deleted"), dir)
    val delta = Seq(("a", 5L, 1L, false)).toDF("k", "x", "v", "_deleted")
    Upsert.appendDelta(delta, dir)
    Upsert.appendDelta(delta, dir)   // replayed batch
    assert(snapMap(dir) == Map("a" -> 5L))
  }

  test("compact folds the log into base; snapshot identical before " +
      "and after, log gone, further deltas still merge") {
    val dir = tmpDir("graft-upsert") + "/t"
    Upsert.writeBase(Seq(("a", 1L, false), ("b", 2L, false))
      .toDF("k", "x", "_deleted"), dir)
    Upsert.appendDelta(Seq(("a", 10L, 1L, false), ("b", 0L, 1L, true))
      .toDF("k", "x", "v", "_deleted"), dir)
    val before = snapMap(dir)
    // live a + RETAINED tombstone b (delete markers persist so older
    // replayed batches cannot resurrect the key)
    val n = Upsert.compact(spark, dir, Seq("k"), "v")
    assert(n == 2 && snapMap(dir) == before)
    assert(before == Map("a" -> 10L))
    // log truncated: base-only read path
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/log")))
    // deleted key can be re-inserted after compaction
    Upsert.appendDelta(Seq(("b", 7L, 3L, false))
      .toDF("k", "x", "v", "_deleted"), dir)
    assert(snapMap(dir) == Map("a" -> 10L, "b" -> 7L))
  }

  test("replay of a PRE-compaction batch after compact is still a " +
      "no-op: versions and tombstones survive compaction") {
    val dir = tmpDir("graft-upsert") + "/t"
    Upsert.writeBase(Seq(("a", 1L, false)).toDF("k", "x", "_deleted"), dir)
    Upsert.appendDelta(Seq(("a", 5L, 1L, false), ("a", 9L, 2L, false),
      ("b", 3L, 1L, false), ("b", 0L, 2L, true))
      .toDF("k", "x", "v", "_deleted"), dir)
    Upsert.compact(spark, dir, Seq("k"), "v")
    // at-least-once source redelivers the v=1 batch
    Upsert.appendDelta(Seq(("a", 5L, 1L, false), ("b", 3L, 1L, false))
      .toDF("k", "x", "v", "_deleted"), dir)
    // a must NOT regress to 5; deleted b must NOT resurrect
    assert(snapMap(dir) == Map("a" -> 9L))
    // purge variant drops the marker (documented as replay-unsafe)
    assert(Upsert.compact(spark, dir, Seq("k"), "v",
      purgeTombstones = true) == 1)
    assert(snapMap(dir) == Map("a" -> 9L))
  }

  test("mid-swap crash state (base renamed aside, tmp complete) is " +
      "readable and the next compact recovers it") {
    val dir = tmpDir("graft-upsert") + "/t"
    Upsert.writeBase(Seq(("a", 1L, false)).toDF("k", "x", "_deleted"), dir)
    Upsert.appendDelta(Seq(("b", 2L, 1L, false))
      .toDF("k", "x", "v", "_deleted"), dir)
    val fsys = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate: compact wrote tmp, renamed base aside, then crashed
    spark.read.parquet(s"$dir/base").write
      .parquet(s"$dir/base.tmp")   // stand-in complete tmp
    fsys.rename(new org.apache.hadoop.fs.Path(s"$dir/base"),
      new org.apache.hadoop.fs.Path(s"$dir/base.old"))
    assert(snapMap(dir) == Map("a" -> 1L, "b" -> 2L))  // tmp fallback
    Upsert.compact(spark, dir, Seq("k"), "v")          // completes swap
    assert(fsys.exists(new org.apache.hadoop.fs.Path(s"$dir/base")) &&
      !fsys.exists(new org.apache.hadoop.fs.Path(s"$dir/base.tmp")) &&
      !fsys.exists(new org.apache.hadoop.fs.Path(s"$dir/base.old")))
    assert(snapMap(dir) == Map("a" -> 1L, "b" -> 2L))
  }

  test("base written without a tombstone column merges (null-filled)") {
    val dir = tmpDir("graft-upsert") + "/t"
    Upsert.writeBase(Seq(("a", 1L)).toDF("k", "x"), dir)
    Upsert.appendDelta(Seq(("b", 2L, 1L, false))
      .toDF("k", "x", "v", "_deleted"), dir)
    assert(snapMap(dir) == Map("a" -> 1L, "b" -> 2L))
  }

  private def asOfMap(dir: String, v: Long) =
    Upsert.snapshotAsOf(spark, dir, Seq("k"), "v", version = v).collect()
      .map(r => r.getAs[String]("k") -> r.getAs[Long]("x")).toMap

  test("snapshotAsOf replays the full key lifecycle: insert, update, " +
      "tombstone window, resurrection") {
    val dir = tmpDir("graft-upsert") + "/t"
    Upsert.writeBase(Seq(("a", 1L, false), ("b", 2L, false))
      .toDF("k", "x", "_deleted"), dir)
    Upsert.appendDelta(Seq(("a", 10L, 1L, false), ("c", 30L, 1L, false))
      .toDF("k", "x", "v", "_deleted"), dir)
    Upsert.appendDelta(Seq(("a", 0L, 2L, true))
      .toDF("k", "x", "v", "_deleted"), dir)
    Upsert.appendDelta(Seq(("a", 99L, 3L, false))
      .toDF("k", "x", "v", "_deleted"), dir)
    assert(asOfMap(dir, 0L) == Map("a" -> 1L, "b" -> 2L))
    assert(asOfMap(dir, 1L) == Map("a" -> 10L, "b" -> 2L, "c" -> 30L))
    assert(asOfMap(dir, 2L) == Map("b" -> 2L, "c" -> 30L)) // a deleted
    assert(asOfMap(dir, 3L) == Map("a" -> 99L, "b" -> 2L, "c" -> 30L))
    // as-of beyond the newest version = the current snapshot
    assert(asOfMap(dir, 99L) == snapMap(dir))
  }

  test("snapshotAsOf after compaction: exact at/above the watermark, " +
      "folded history below it is gone (vacuum contract)") {
    val dir = tmpDir("graft-upsert") + "/t"
    Upsert.writeBase(Seq(("a", 1L, false)).toDF("k", "x", "_deleted"), dir)
    Upsert.appendDelta(Seq(("a", 10L, 1L, false), ("b", 20L, 1L, false))
      .toDF("k", "x", "v", "_deleted"), dir)
    Upsert.compact(spark, dir, Seq("k"), "v")
    // at/above the compaction watermark: unchanged
    assert(asOfMap(dir, 1L) == Map("a" -> 10L, "b" -> 20L))
    // below it: the folded v0 value of a is no longer reconstructible —
    // compacted rows carry v=1, so as-of 0 sees nothing
    assert(asOfMap(dir, 0L) == Map.empty[String, Long])
  }
}
