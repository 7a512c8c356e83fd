package graft.queries

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Property pins for the round-13 closures, beyond the oracle gates:
  *
  *  - the streamed-ingest probes reconcile IN-ENGINE against their
  *    cold-scan twins (the merged≡cold discipline of Round12Spec,
  *    extended to segments a STREAM wrote) — and the in-band
  *    multi-batch evidence actually fired;
  *  - the refresh-leg entries (warm base + delta-only derivation)
  *    land on the whole-cycle entries' answers row-for-row, so the
  *    pricing split cannot have changed semantics;
  *  - loadQuantizer is a lossless round-trip of the persisted
  *    centroid/codebook metadata (the frozen-quantizer refresh leg
  *    encodes against EXACTLY what training produced);
  *  - the trigram delete leg never surfaces a tombstoned doc;
  *  - the y4m decoder fails SOFT on overflowing geometry headers
  *    (ADVICE-r12).
  */
class Round13Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("stream_index_ingest ≡ bm25_join_topk in-engine (base ∪ " +
      "streamed-delta ≡ cold full scan) with the multi-batch evidence " +
      "row genuinely 1") {
    import spark.implicits._
    val cold = Registry.queryMap("bm25_join_topk")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val out = Registry.queryMap("stream_index_ingest")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val (ev, probe) = out.partition(_.head == -1L)
    assert(ev.size == 1 && ev.head(1) == 1L,
      s"multi-batch ingest evidence missing or 0: $ev")
    assert(probe == cold,
      s"cold scan:\n$cold\nstreamed-ingest probe:\n$probe")
    assert(probe.nonEmpty, "no BM25 hits — the pin is vacuous")
  }

  test("stream_ann_ingest ≡ sim_ivf_fullprobe in-engine (base ∪ " +
      "streamed-delta ≡ in-plan full probe) with multi-batch evidence") {
    val cold = Registry.queryMap("sim_ivf_fullprobe")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val out = Registry.queryMap("stream_ann_ingest")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val (ev, probe) = out.partition(_.head == -1L)
    assert(ev.size == 1 && ev.head(1) == 1L,
      s"multi-batch ingest evidence missing or 0: $ev")
    assert(probe == cold,
      "streamed-ingest ANN probe diverged from the in-plan full probe")
    assert(probe.nonEmpty, "no ANN rows — the pin is vacuous")
  }

  test("the refresh-leg entries land on their whole-cycle twins' " +
      "answers row-for-row (warm-base pricing split changed cost, " +
      "not semantics)") {
    def rows(n: String) = Registry.queryMap(n)(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(rows("bm25_probe_refresh") == rows("bm25_probe_merged"),
      "text refresh leg diverged from the whole-cycle merge")
    assert(rows("index_compact_warm") == rows("index_compact"),
      "warm compaction diverged from the whole-cycle compaction")
    assert(rows("ann_probe_refresh") == rows("sim_ivf_probe_merged"),
      "ANN refresh leg diverged from the whole-cycle merge")
    assert(rows("ann_compact_warm") == rows("ann_compact"),
      "warm ANN compaction diverged from the whole-cycle compaction")
  }

  test("loadQuantizer round-trips the persisted metadata bit-exactly " +
      "— the refresh leg encodes against EXACTLY what training froze") {
    val A = graft.operators.AnnIndex
    val base = graft.Tables.embeddings(spark, sf)
      .where(col("embedding").isNotNull)
      .filter(col("vec_id") % 10 =!= 7)
    val trained = A.trainQuantizer(base, "embedding")
    val loaded = A.loadQuantizer(spark, A.splitSegmentDir(spark, sf))
    assert(trained.coarse.map(_.toSeq).toSeq ==
      loaded.coarse.map(_.toSeq).toSeq,
      "centroids drifted through the persist/load cycle")
    assert(trained.books.map(_.map(_.toSeq).toSeq).toSeq ==
      loaded.books.map(_.map(_.toSeq).toSeq).toSeq,
      "codebooks drifted through the persist/load cycle")
  }

  test("trgm_probe_tombstoned never surfaces a deleted doc, and " +
      "deletes only what the tombstone set names") {
    import spark.implicits._
    val out = Registry.queryMap("trgm_probe_tombstoned")(spark, sf)
    assert(out.filter($"doc_id" % 17 === 3).count() == 0,
      "a tombstoned doc leaked through the masked trigram probe")
    val full = Registry.queryMap("trgm_probe_persisted")(spark, sf)
    val lost = full.join(out, Seq("doc_id"), "left_anti")
    assert(lost.filter($"doc_id" % 17 =!= 3).count() == 0,
      "the mask dropped a LIVE doc")
  }

  test("the trigram matrix closes consistently: compacted ≡ masked " +
      "(two plans, one rebuilt answer) and streamed-ingest ≡ the warm " +
      "persisted probe with multi-batch evidence") {
    def rows(n: String) = Registry.queryMap(n)(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(rows("trgm_compact") == rows("trgm_probe_tombstoned"),
      "compacted trigram probe diverged from the masked probe")
    val out = rows("stream_trgm_ingest")
    val (ev, probe) = out.partition(_.head == -1L)
    assert(ev.size == 1 && ev.head(1) == 1L,
      s"multi-batch trigram-ingest evidence missing or 0: $ev")
    assert(probe == rows("trgm_probe_persisted"),
      "streamed trigram ingest diverged from the warm persisted probe")
    assert(probe.nonEmpty, "no substring hits — the pin is vacuous")
  }

  test("y4m decode fails soft (None) on overflowing geometry headers " +
      "— ADVICE-r12") {
    val M = graft.operators.Multimodal.Y4mCodec
    for (wh <- Seq((46341, 46341), (65536, 65536))) {
      val hdr = s"YUV4MPEG2 W${wh._1} H${wh._2} F25:1 Ip A1:1 Cmono\n"
      val payload = (hdr + "FRAME\n").getBytes("US-ASCII") ++
        Array.fill[Byte](64)(0)
      assert(M.decode(payload).isEmpty,
        s"W${wh._1} H${wh._2} must fail soft, not throw or decode")
    }
    // a sane stream still decodes (the guard is not over-broad)
    val ok = M.encode(M.Video(8, 8, 25, 1,
      Array(Array.fill[Byte](64)(3))))
    assert(M.decode(ok).exists(_.frames.length == 1))
  }
}
