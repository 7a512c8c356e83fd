package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "hello world"), (2L, "abc"))
    .toDF("doc_id", "text")
  private lazy val media = Multimodal.fromText(docs, "doc_id", "text")

  test("binary envelope carries payload bytes + typed metadata") {
    val r = media.filter($"media_id" === 1).collect().head
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") ==
      "hello world")
    assert(r.getAs[String]("modality") == "image")
  }

  test("per-partition feature extraction: deterministic stub, real plumbing") {
    val feats = Multimodal.extractFeatures(media, dims = 4).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(1L).n_bytes == 11)
    // sha256("hello world")
    assert(feats(1L).sha256 ==
      "b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9")
    assert(feats(1L).features.length == 4)
    // deterministic across runs
    val again = Multimodal.extractFeatures(media, dims = 4).collect()
      .find(_.media_id == 1L).get
    assert(again.features.toSeq == feats(1L).features.toSeq)
  }

  test("resize: stride-sampled grid is deterministic; small payloads drop") {
    val r = Multimodal.resize(media, 2, 2).collect()
      .map(x => x.getAs[Long]("media_id") -> x).toMap
    // "hello world" (11 bytes) → 4 bytes at stride 2.75: indices 0,2,5,8
    val g = r(1L).getAs[Array[Byte]]("resized")
    assert(g.toSeq == "hello world".getBytes("UTF-8")
      .zipWithIndex.collect { case (b, i) if Set(0, 2, 5, 8)(i) => b }.toSeq)
    // "abc" (3 bytes) < 4 target bytes → dropped
    assert(!r.contains(2L))
    // deterministic across runs
    val again = Multimodal.resize(media, 2, 2).collect()
      .find(_.getAs[Long]("media_id") == 1L).get
    assert(again.getAs[Array[Byte]]("resized").toSeq == g.toSeq)
  }

  test("frame sampling explodes payload into per-frame features") {
    val frames = Multimodal.sampleFrames(media, frames = 3, dims = 2)
      .collect()
    assert(frames.count(_.getAs[Long]("media_id") == 1L) == 3)
    assert(frames.forall(_.getAs[Seq[Float]]("features").length == 2))
  }
}
