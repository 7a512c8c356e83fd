package graft.queries

import graft.SparkSpec
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._

/** Boundary semantics the stream_* oracle rows (queries/Streaming.scala)
  * depend on. The oracles rebuild Spark's window/session/interval
  * arithmetic in SQL; each test pins the exact edge the SQL encodes, so
  * a Spark-version semantics change breaks HERE with a readable message
  * instead of as a driver hash mismatch. */
class StreamGateSpec extends SparkSpec {
  import spark.implicits._

  private val gapUs = 30L * 60 * 1000 * 1000 // 30 minutes
  private def frame(usOffsets: Long*) =
    usOffsets.toSeq.toDF("us")
      .select(lit(1L).as("user_id"), timestamp_micros($"us").as("ets"),
        lit(1.0).as("value"))

  test("session_window: gap exactly = gapDuration still MERGES") {
    // Spark merges when the next event's window START touches the
    // previous session's end (inclusive <=): an event exactly gap
    // after its predecessor extends the session; gap+1us splits. The
    // stream_sessions oracle encodes this as `gap > gapUs => new`.
    val one = StreamOps.sessionAgg(frame(0L, gapUs), "ets", "1 minute",
      "30 minutes", Seq("user_id")).collect()
    assert(one.length == 1, "events exactly gap apart must merge")
    val two = StreamOps.sessionAgg(frame(0L, gapUs + 1), "ets", "1 minute",
      "30 minutes", Seq("user_id")).collect()
    assert(two.length == 2, "events gap+1us apart must not merge")
  }

  test("session_window: end = last event + gap, start = first event") {
    val r = StreamOps.sessionAgg(frame(0L, 1000L), "ets", "1 minute",
        "30 minutes", Seq("user_id"))
      .select(unix_micros($"session_window.start"),
        unix_micros($"session_window.end")).head()
    assert(r.getLong(0) == 0L)
    assert(r.getLong(1) == 1000L + gapUs)
  }

  test("tumbling window: epoch-aligned, start inclusive / end exclusive") {
    val hourUs = 3600L * 1000 * 1000
    val r = StreamOps.windowedAgg(frame(hourUs, 2 * hourUs - 1), "ets",
        "10 minutes", "1 hour")
      .select(unix_micros($"window.start"), $"n").orderBy($"n")
      .collect()
    assert(r.length == 1, "both events fall in the [1h, 2h) window")
    assert(r.head.getLong(0) == hourUs)
  }

  test("interval join: [lo, lo+bound] inclusive on both ends") {
    val boundUs = 600L * 1000 * 1000 // 10 minutes
    val left = Seq(0L).toDF("us")
      .select(lit(1L).as("k"), timestamp_micros($"us").as("ets"),
        lit(10L).as("l_id"))
    def right(us: Long*) = us.toSeq.toDF("us")
      .select(lit(1L).as("k"), timestamp_micros($"us").as("ets"),
        $"us".as("r_id"))
    val hit = StreamOps.intervalJoin(left, right(0L, boundUs),
      "k", "ets", "ets", "10 minutes", "10 minutes").collect()
    assert(hit.length == 2, "ts == lo and ts == lo+bound both match")
    val miss = StreamOps.intervalJoin(left, right(-1L, boundUs + 1),
      "k", "ets", "ets", "10 minutes", "10 minutes").collect()
    assert(miss.isEmpty, "1us outside either end must not match")
  }

  test("stream_dedup gate: multi-batch replay WITH eviction " +
      "== batch distinct over the hour-bucketed key") {
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory)
    val got = Streaming.stream_dedup.fn(spark, d).collect()
    // the in-band eviction evidence must actually fire: state was
    // removed during the replay AND peak state never held the whole
    // key set (the r8 construction's whole point)
    assert(got.forall(_.getAs[Boolean]("state_evicted")),
      "no state eviction observed during the replay")
    assert(got.forall(_.getAs[Boolean]("state_bounded")),
      "peak state held the entire key set")
    val gotSet = got.map(r => (r.getAs[Long]("user_id"),
      r.getAs[Long]("n_keys"), r.getAs[Long]("h_checksum"),
      r.getAs[Long]("n_types"))).toSet
    val exp = graft.Tables.events(spark, d)
      .select($"user_id", $"event_type",
        expr("unix_micros(cast(ts as timestamp)) DIV 3600000000")
          .as("h"))
      .distinct()
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_keys"), sum($"h").as("h_checksum"),
        countDistinct($"event_type").as("n_types"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(gotSet == exp)
  }

  test("stream_static_join: watermark must be applied BEFORE the " +
      "inner join, or the sentinel cannot finalize append windows") {
    // Two-batch replay: batch 1 = one real row in window [0, 1h);
    // batch 2 = the flush sentinel on a key the dimension does NOT
    // hold. With the watermark on the stream side the sentinel
    // advances it through the EventTimeWatermark node even though the
    // join then drops the row; with the watermark applied AFTER the
    // join the sentinel never reaches the node and the window is
    // never finalized in append mode.
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.DataFrame
    val dim = Seq((1L, "A")).toDF("k", "seg")
    def run(wmFirst: Boolean): Long = {
      val t = java.nio.file.Files
        .createTempDirectory("graft-ssj-pin").toString
      frame(1000L).coalesce(1).write.mode("append").parquet(s"$t/in")
      frame(400L * 86400 * 1000000).select(
          lit(-1L).as("user_id"), $"ets", $"value")
        .coalesce(1).write.mode("append").parquet(s"$t/in")
      val src = spark.readStream
        .schema(spark.read.parquet(s"$t/in").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$t/in")
      val joined: DataFrame =
        if (wmFirst)
          src.withWatermark("ets", "1 minute")
            .join(dim, $"user_id" === $"k")
        else
          src.join(dim, $"user_id" === $"k")
            .withWatermark("ets", "1 minute")
      val q = joined.groupBy(window($"ets", "1 hour"), $"seg")
        .agg(count(lit(1)).as("n"))
        .writeStream.format("parquet")
        .option("path", s"$t/out")
        .option("checkpointLocation", s"$t/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(s"$t/out").count()
    }
    assert(run(wmFirst = true) == 1L,
      "watermark-before-join must emit the finalized window")
    assert(run(wmFirst = false) == 0L,
      "watermark-after-join silently never finalizes — the ordering " +
        "the gate encodes is load-bearing")
  }

  test("cdc LWW state machine: REVERSE-chronological arrival yields " +
      "the identical snapshot, and a key's winner never regresses") {
    // stream_cdc_apply replays oldest-first (date-sliced); the LWW
    // claim the gate's scaladoc makes — arrival order is irrelevant
    // because max-by-seq is commutative — is only a claim until a
    // backwards replay proves it. Three micro-batches arrive NEWEST
    // first; the final snapshot must match the batch collapse of the
    // raw log, and every emission for a key must carry a seq >= all
    // its earlier emissions (state can only move forward).
    val dir = java.nio.file.Files.createTempDirectory("cdcrev").toString
    try {
      val slices = Seq(
        Seq((1L, 300L, "U", 30L, "A"), (2L, 250L, "U", 25L, "B")),
        Seq((1L, 200L, "D", 20L, "A")),
        Seq((1L, 100L, "U", 10L, "A"), (2L, 150L, "D", 99L, "B")))
      slices.zipWithIndex.foreach { case (rows, i) =>
        rows.toDF("k", "seq", "op", "cents", "pri")
          .coalesce(1).write.parquet(s"$dir/in/slice$i")
        // distinct mtimes pin the file-source processing order
        Thread.sleep(30)
        val d = new java.io.File(s"$dir/in/slice$i")
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .foreach(f => java.nio.file.Files.move(f.toPath,
            java.nio.file.Paths.get(s"$dir/in/b$i.parquet")))
      }
      val q = StreamOps.cdcApplyStream(
        spark.readStream
          .schema(spark.read.parquet(s"$dir/in/b0.parquet").schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$dir/in"))
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val updates = spark.read.parquet(s"$dir/out")
      val snap = Pipeline.cdcCollapse(updates).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(snap == Set(("A", 1L, 30L), ("B", 1L, 25L)),
        s"reverse replay diverged: $snap")
      // no regression: key 1 emits seq 300 in EVERY batch it appears
      val k1 = updates.filter($"k" === 1L).select($"seq")
        .as[Long].collect()
      assert(k1.length >= 2 && k1.forall(_ == 300L),
        s"winner regressed under late stale batches: ${k1.toSeq}")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir))
  }

  test("dict state machine: doc-disjoint batches accumulate the exact " +
      "dictionary; a doc SPLIT across batches double-counts df — the " +
      "slicing invariant stream_index_dict relies on is load-bearing") {
    import spark.implicits._
    def run(slices: Seq[Seq[(Long, String)]]): Map[String, (Long, Long)] = {
      val dir = java.nio.file.Files.createTempDirectory("dictgate").toString
      try {
        slices.zipWithIndex.foreach { case (rows, i) =>
          rows.toDF("doc_id", "term")
            .coalesce(1).write.parquet(s"$dir/in/slice$i")
          Thread.sleep(30)
          val d = new java.io.File(s"$dir/in/slice$i")
          d.listFiles().filter(_.getName.endsWith(".parquet"))
            .foreach(f => java.nio.file.Files.move(f.toPath,
              java.nio.file.Paths.get(s"$dir/in/b$i.parquet")))
        }
        val q = StreamOps.indexDictStream(
          spark.readStream
            .schema(spark.read.parquet(s"$dir/in/b0.parquet").schema)
            .option("maxFilesPerTrigger", "1").parquet(s"$dir/in"))
          .writeStream.format("parquet")
          .option("path", s"$dir/out")
          .option("checkpointLocation", s"$dir/ckpt")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        spark.read.parquet(s"$dir/out")
          .groupBy($"term")
          .agg(max($"df").as("df"), max($"total_tf").as("tf"))
          .collect()
          .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      } finally
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(dir))
    }
    // doc 1 = "a a b", doc 2 = "a c" — intact docs, one per batch
    val good = run(Seq(
      Seq((1L, "a"), (1L, "a"), (1L, "b")),
      Seq((2L, "a"), (2L, "c"))))
    assert(good == Map("a" -> (2L, 3L), "b" -> (1L, 1L),
      "c" -> (1L, 1L)), s"exact dictionary lost: $good")
    // same token multiset, but doc 1's 'a' rows straddle two batches:
    // df('a') double-counts doc 1 — tf stays exact (additive under
    // ANY batching), which is precisely why only df needs the
    // doc-disjoint slicing invariant
    val split = run(Seq(
      Seq((1L, "a"), (1L, "b")),
      Seq((1L, "a"), (2L, "a"), (2L, "c"))))
    assert(split("a") == (3L, 3L),
      s"expected df('a') to double-count the split doc: $split")
    assert(split("b") == (1L, 1L) && split("c") == (1L, 1L))
  }
}
