package graft.queries

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Property pins for the round-14 closures, beyond the oracle gates:
  *
  *  - the streamed-ingest gates' idempotent-replay claim becomes a
  *    TEST (VERDICT-r13 "what's missing" #4): every batch is
  *    re-delivered through a second AvailableNow run with a fresh
  *    checkpoint into the SAME batchId-keyed segment dirs, and the
  *    probe answer must be byte-identical — `mode=overwrite` per
  *    batch dir is the crash-replay contract, now exercised rather
  *    than argued;
  *  - the production fused probe's hit count is pinned as a NUMBER
  *    per test SF (ADVICE-r13: the oracle floor now sits one hit
  *    below the measured minimum; the exact value lives here);
  *  - ann_retrain_apply's two populations are measured side by side
  *    (ADVICE-r13): the arrival-batch skew fires the threshold, the
  *    full-index pre-retrain skew sits BELOW it (dilution), and the
  *    numbers are asserted so the documented asymmetry stays true;
  *  - ann_retrain_epoch reconciles in-engine: epochs 2 and 3 serve
  *    IDENTICAL answers (retraining moved cell boundaries, never
  *    vectors) while epoch 1 differs (the commit actually changed
  *    the servable corpus);
  *  - the fused delete leg is non-vacuous: the takedown reshaped the
  *    fused top-10, and no tombstoned doc survives in it;
  *  - the trigram warm twins land on their whole-cycle twins'
  *    answers row-for-row (the Round13Spec refresh ≡ whole-cycle
  *    discipline, extended to the third lifecycle);
  *  - the multimodal release's planted re-uploads are each dropped
  *    by exactly the modality that planted them, and `kept` is the
  *    conjunction of the four verdicts.
  */
class Round14Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streamed trigram ingest is idempotent under FULL re-delivery: " +
      "a second AvailableNow run (fresh checkpoint, same segment dirs) " +
      "leaves the probe byte-identical") {
    import spark.implicits._
    val t = java.nio.file.Files
      .createTempDirectory("graft-replay-idem").toString
    def trgmsOf(dd: org.apache.spark.sql.DataFrame) =
      dd.select($"doc_id", explode(expr(
        "transform(sequence(1, greatest(length(text) - 2, 1))," +
          " i -> substring(text, i, 3))")).as("g"))
        .distinct()
    val docs = graft.Tables.documents(spark, sf)
    trgmsOf(docs.filter($"doc_id" % 10L =!= 0L))
      .write.parquet(s"$t/base_trgm")
    val delta = docs.filter($"doc_id" % 10L === 0L)
      .select($"doc_id", $"text")
      .withColumn("ets", timestamp_seconds($"doc_id"))
    val k = Streaming.sliceCount(delta.count())
    Streaming.writeTimeSliced(delta, "ets", s"$t/in", k)
    def ingest(ckpt: String): Unit =
      Streaming.replayForeach(spark, ckpt, s"$t/in") { (batch, id) =>
        trgmsOf(batch.drop("ets")).withColumn("batch_id", lit(id))
          .write.mode("overwrite").parquet(s"$t/delta_trgm/b$id")
      }
    def probe(): Seq[Seq[Any]] = {
      val pat = "ash jo"
      val patTrgs = pat.sliding(3).toSeq.distinct
      val merged = spark.read.parquet(s"$t/base_trgm")
        .unionByName(spark.read.parquet(s"$t/delta_trgm/b*")
          .drop("batch_id"))
      val cands = merged.filter($"g".isin(patTrgs: _*))
        .groupBy($"doc_id").agg(count(lit(1)).as("ng"))
        .filter($"ng" === patTrgs.size.toLong).select($"doc_id")
      docs.join(broadcast(cands), Seq("doc_id"))
        .filter($"text".contains(pat))
        .select($"doc_id").orderBy($"doc_id")
        .collect().map(_.toSeq).toSeq
    }
    ingest(s"$t/run1")
    val first = probe()
    val firstDirs = new java.io.File(s"$t/delta_trgm").list().sorted.toSeq
    // crash-replay: a FRESH checkpoint re-delivers EVERY batch into
    // the same batchId-keyed dirs (the worst replay case — not one
    // duplicate batch but all of them)
    ingest(s"$t/run2")
    val second = probe()
    val secondDirs = new java.io.File(s"$t/delta_trgm").list().sorted.toSeq
    assert(first.nonEmpty, "no substring hits — the pin is vacuous")
    assert(first == second,
      s"re-delivered batches changed the probe:\n$first\nvs\n$second")
    assert(firstDirs == secondDirs,
      s"re-delivery changed the segment dir set: $firstDirs vs $secondDirs")
  }

  test("streamed postings ingest is idempotent under full re-delivery " +
      "(the text lifecycle's crash-replay contract)") {
    import spark.implicits._
    val t = java.nio.file.Files
      .createTempDirectory("graft-replay-idem-txt").toString
    def toksOf(c: org.apache.spark.sql.Column) =
      filter(split(lower(c), " "), x => x =!= "")
    def postingsOf(dd: org.apache.spark.sql.DataFrame) =
      dd.select($"doc_id", size(toksOf($"text")).cast("long").as("dl"),
          explode(toksOf($"text")).as("term"))
        .groupBy($"term", $"doc_id", $"dl")
        .agg(count(lit(1)).as("tf"))
        .select("term", "doc_id", "tf", "dl")
    val docs = graft.Tables.documents(spark, sf)
    val delta = docs.filter($"doc_id" % 10L === 0L)
      .select($"doc_id", $"text")
      .withColumn("ets", timestamp_seconds($"doc_id"))
    val k = Streaming.sliceCount(delta.count())
    Streaming.writeTimeSliced(delta, "ets", s"$t/in", k)
    def ingest(ckpt: String): Unit =
      Streaming.replayForeach(spark, ckpt, s"$t/in") { (batch, id) =>
        postingsOf(batch.drop("ets")).withColumn("batch_id", lit(id))
          .write.mode("overwrite").parquet(s"$t/delta_postings/b$id")
      }
    ingest(s"$t/run1")
    def segment(): Seq[Seq[Any]] =
      spark.read.parquet(s"$t/delta_postings/b*")
        .orderBy($"term", $"doc_id", $"batch_id")
        .collect().map(_.toSeq).toSeq
    val first = segment()
    ingest(s"$t/run2")
    val second = segment()
    assert(first.nonEmpty, "empty delta segment — the pin is vacuous")
    assert(first == second,
      "re-delivered batches changed the streamed postings segment")
  }

  test("the ingest gates' slice geometry is genuinely multi-batch at " +
      "the test SF (the >= 2 property moved in-engine from the oracle " +
      "evidence row)") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val delta = docs.filter($"doc_id" % 10L === 0L)
      .select($"doc_id").withColumn("ets", timestamp_seconds($"doc_id"))
    val k = Streaming.sliceCount(delta.count())
    val nonEmpty = Streaming.nonEmptySlices(delta, "ets", k)
    assert(k >= 2, s"sliceCount floor violated: $k")
    assert(nonEmpty >= 2,
      s"only $nonEmpty non-empty slices — the multi-batch evidence " +
        "would be vacuous at this SF")
  }

  test("rrf_probe_production's exact hit count at sf0.001 is 8 of 10 " +
      "(the oracle floor is 4; the number lives here — ADVICE-r13)") {
    assert(Retrieval.rrfProductionHits(spark, sf) == 8L)
  }

  test("ann_retrain_apply population asymmetry, measured: the arrival " +
      "batch fires the threshold, the full frozen-quantizer index " +
      "does NOT (dilution), post-retrain skew sits below both") {
    import spark.implicits._
    val A = graft.operators.AnnIndex
    val qz = A.loadQuantizer(spark, A.splitSegmentDir(spark, sf))
    val vecs = graft.Tables.embeddings(spark, sf)
      .where($"embedding".isNotNull)
    val base = vecs.filter($"vec_id" % 10L =!= 7L)
      .select($"vec_id", $"embedding")
    val delta = vecs.filter($"vec_id" % 10L === 7L)
      .select($"vec_id", transform($"embedding",
        (x, i) => (x * lit(0.2) +
          when(i === 0, lit(1.0)).otherwise(lit(0.0))).cast("float"))
        .as("embedding"))
    val union = base.unionByName(delta)
    def ratio(dd: org.apache.spark.sql.DataFrame): Double =
      dd.select(A.assignCell($"embedding", qz.centroidMeta).as("cell"))
        .groupBy($"cell").agg(count(lit(1)).as("n"))
        .agg(((max($"n") * lit(A.NList.toLong)).cast("double") /
          sum($"n").cast("double")).as("r"))
        .head().getDouble(0)
    val preBatch = ratio(delta)
    val preFull = ratio(union)
    val q1 = A.trainQuantizer(union, "embedding")
    val post = union
      .select(A.assignCell($"embedding", q1.centroidMeta).as("cell"))
      .groupBy($"cell").agg(count(lit(1)).as("n"))
      .agg(((max($"n") * lit(A.NList.toLong)).cast("double") /
        sum($"n").cast("double")).as("r"))
      .head().getDouble(0)
    info(f"pre ratio over the ARRIVAL BATCH: $preBatch%.2f " +
      f"(threshold 4.0), over the FULL frozen index: $preFull%.2f, " +
      f"post-retrain over the full rebuilt index: $post%.2f")
    assert(preBatch > 4.0,
      s"the drifted batch no longer fires the threshold: $preBatch")
    assert(preFull < preBatch,
      "full-index dilution inverted — the documented asymmetry is stale")
    assert(post < 4.0, s"the retrain left the threshold tripped: $post")
    assert(post < preFull,
      "the commensurate comparison regressed: post-retrain skew " +
        s"($post) is no better than the frozen full-index skew ($preFull)")
  }

  test("ann_retrain_epoch serves IDENTICAL answers at epochs 2 and 3 " +
      "(retraining moved cell boundaries, never vectors) and a " +
      "DIFFERENT answer at epoch 1 (the delta commit is visible)") {
    val out = Registry.queryMap("ann_retrain_epoch")(spark, sf)
      .collect().map(_.toSeq).toSeq
    def epoch(e: Int) = out.filter(_.head == e).map(_.tail)
    assert(epoch(2).nonEmpty && epoch(2) == epoch(3),
      "epoch 3 (retrained, qver 2) diverged from epoch 2 — the " +
        "retrain moved a vector")
    assert(epoch(1) != epoch(2),
      "epoch 1 equals epoch 2 — the delta commit changed nothing, " +
        "the time-travel pin is vacuous")
  }

  test("rrf_probe_tombstoned: no tombstoned doc survives in the fused " +
      "top-10, and the takedown actually reshaped the fused answer") {
    val masked = Registry.queryMap("rrf_probe_tombstoned")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val full = Registry.queryMap("rrf_probe_persisted")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(masked.size == 10, s"fused top-10 has ${masked.size} rows")
    assert(masked.forall(r => r.head.asInstanceOf[Long] % 17 != 3),
      s"a tombstoned doc resurfaced in the fused answer: $masked")
    assert(masked.map(_.head) != full.map(_.head),
      "the takedown left the fused top-10 untouched — the pin is " +
        "vacuous (no tombstoned doc was in either leg's window)")
  }

  test("rrf_probe_asof: snapshot (2,2) serves the full-corpus fused " +
      "answer (≡ rrf_probe_persisted row-for-row) and snapshot (1,1) " +
      "differs (the two deltas' commits are visible in the fusion)") {
    val out = Registry.queryMap("rrf_probe_asof")(spark, sf)
      .collect().map(_.toSeq).toSeq
    def epoch(e: Int) = out.filter(_.head == e).map(_.tail)
    val full = Registry.queryMap("rrf_probe_persisted")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(epoch(2) == full,
      "snapshot (2,2) diverged from the warm full-corpus fused probe")
    assert(epoch(1) != epoch(2),
      "snapshot (1,1) equals (2,2) — neither delta commit moved the " +
        "fused top-10, the time-travel pin is vacuous")
  }

  test("the trigram warm twins land on their whole-cycle twins' " +
      "answers row-for-row (pricing split changed cost, not semantics)") {
    def rows(n: String) = Registry.queryMap(n)(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(rows("trgm_probe_refresh") == rows("trgm_probe_merged"),
      "trigram refresh leg diverged from the whole-cycle merge")
    assert(rows("trgm_compact_warm") == rows("trgm_compact"),
      "warm trigram compaction diverged from the whole-cycle compaction")
  }

  test("mm_release_e2e: every planted re-upload is dropped by exactly " +
      "its planting modality, and kept is the conjunction of the four " +
      "verdicts") {
    val rows = Registry.queryMap("mm_release_e2e")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (di, da, dv, dt) = (r.getAs[Boolean]("drop_img"),
        r.getAs[Boolean]("drop_aud"), r.getAs[Boolean]("drop_vid"),
        r.getAs[Boolean]("drop_txt"))
      if (id % 10 == 6)
        assert(di, s"planted image re-upload $id not dropped")
      if (id % 7 == 4)
        assert(da, s"planted audio re-upload $id not dropped")
      if (id % 13 == 9)
        assert(dv, s"planted video re-upload $id not dropped")
      assert(r.getAs[Boolean]("kept") == !(di || da || dv || dt),
        s"kept is not the conjunction of the verdicts at doc $id")
    }
    assert(rows.exists(_.getAs[Boolean]("kept")),
      "the release kept nothing — the gate is vacuous")
  }
}
