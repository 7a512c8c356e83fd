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
    val n = Upsert.compact(spark, dir, Seq("k"), "v")
    assert(n == 1 && snapMap(dir) == before)
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

  test("base written without a tombstone column merges (null-filled)") {
    val dir = tmpDir("graft-upsert") + "/t"
    Upsert.writeBase(Seq(("a", 1L)).toDF("k", "x"), dir)
    Upsert.appendDelta(Seq(("b", 2L, 1L, false))
      .toDF("k", "x", "v", "_deleted"), dir)
    assert(snapMap(dir) == Map("a" -> 1L, "b" -> 2L))
  }
}
