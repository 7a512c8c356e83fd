package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  import Multimodal.PpmCodec
  import Multimodal.PpmCodec.Image

  private val docs = Seq((1L, "hello world"), (2L, "abc"))
    .toDF("doc_id", "text")
  private lazy val media = Multimodal.toPpm(docs, "doc_id", "text")

  // 2×2 image with distinct channel values per pixel
  private val tiny = Image(2, 2, 255,
    Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120))

  test("PPM codec round-trips encode → decode") {
    val back = PpmCodec.decode(PpmCodec.encode(tiny)).get
    assert(back.width == 2 && back.height == 2 && back.maxval == 255)
    assert(back.pixels.toSeq == tiny.pixels.toSeq)
  }

  test("PPM header grammar: comments and arbitrary whitespace parse") {
    val hdr = "P6 # comment after magic\n# full-line comment\n  2\t2 # dims\n255\n"
    val payload = hdr.getBytes("US-ASCII") ++ tiny.pixels
    val img = PpmCodec.decode(payload).get
    assert(img.width == 2 && img.height == 2)
    assert(img.pixels.toSeq == tiny.pixels.toSeq)
  }

  test("PPM decode rejects malformed payloads") {
    assert(PpmCodec.decode(null).isEmpty)
    assert(PpmCodec.decode("hello world".getBytes).isEmpty)          // magic
    assert(PpmCodec.decode("P6\n2 2\n255\n".getBytes).isEmpty)       // no raster
    assert(PpmCodec.decode(
      PpmCodec.encode(tiny).dropRight(1)).isEmpty)                   // truncated
    assert(PpmCodec.decode("P6\n2 2\n65535\n".getBytes ++
      new Array[Byte](24)).isEmpty)                                  // 2-byte maxval
    assert(PpmCodec.decode("P6\n0 2\n255\n".getBytes).isEmpty)       // zero dim
    assert(PpmCodec.decode("P6\n2 x\n255\n".getBytes).isEmpty)       // non-digit
  }

  test("toPpm payloads decode to the documented deterministic raster") {
    val r = media.filter($"media_id" === 1).collect().head
    val img = PpmCodec.decode(r.getAs[Array[Byte]]("payload")).get
    // id=1: w = 8 + 1%8 = 9; "hello world" is 11 bytes: h = 8 + 11%5 = 9
    assert(img.width == 9 && img.height == 9)
    assert(img.pixels.zipWithIndex.forall { case (b, j) =>
      (b & 0xff) == (7 * j + 13) % 256
    })
  }

  test("extractFeatures decodes real pixels; corrupt blobs get nulls") {
    val feats = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    val f1 = feats(1L)
    assert(f1.width.contains(9) && f1.height.contains(9))
    assert(f1.n_pixels.contains(81L))
    val expSum = (0 until 3 * 81).map(j => (7 * j + 13) % 256).sum.toLong
    assert(f1.pixel_sum.contains(expSum))
    assert(f1.features.length == 4)
    val expMeanR = (0 until 81).map(p => (7 * (3 * p) + 13) % 256)
      .sum.toDouble / 81
    assert(math.abs(f1.features(0) - expMeanR) < 1e-4)
    // a non-PPM payload: envelope stats survive, image fields null
    val opaque = Multimodal.fromText(docs, "doc_id", "text")
    val g = Multimodal.extractFeatures(opaque).collect()
      .find(_.media_id == 1L).get
    assert(g.n_bytes == 11 && g.width.isEmpty && g.features.isEmpty)
    assert(g.sha256 ==
      "b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9")
    // a NULL payload: zero-byte envelope row, not a task-killing NPE
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(99L, "image", null))),
      new org.apache.spark.sql.types.StructType()
        .add("media_id", "long", nullable = false)
        .add("modality", "string").add("payload", "binary"))
    val h = Multimodal.extractFeatures(withNull).collect().head
    assert(h.media_id == 99L && h.n_bytes == 0 && h.sha256 == "" &&
      h.width.isEmpty && h.features.isEmpty)
    // null payloads drop from the raster paths, same as undecodable
    assert(Multimodal.resize(withNull, 2, 2).count() == 0)
    assert(Multimodal.sampleFrames(withNull, 2).count() == 0)
  }

  test("resize is true nearest-neighbor (up- and down-sampling)") {
    val one = Seq((7L, "x")).toDF("doc_id", "text")
    val m = spark.createDataFrame(
      Seq((7L, PpmCodec.encode(tiny))).toDF("media_id", "payload").rdd,
      new org.apache.spark.sql.types.StructType()
        .add("media_id", "long").add("payload", "binary"))
    // downsample 2×2 → 1×1: target (0,0) samples source (0,0)
    val down = Multimodal.resize(m, 1, 1).collect().head
    assert(down.getAs[Array[Byte]]("resized").toSeq ==
      Seq[Byte](10, 20, 30))
    // upsample 2×2 → 4×4: each source pixel becomes a 2×2 block
    val up = Multimodal.resize(m, 4, 4).collect().head
    val px = up.getAs[Array[Byte]]("resized")
    assert(px.length == 48)
    // target (1,1) → source (1*2/4, 1*2/4) = (0,0); (2,1) → (1,0)
    assert(px.slice(3 * (1 * 4 + 1), 3 * (1 * 4 + 1) + 3).toSeq ==
      Seq[Byte](10, 20, 30))
    assert(px.slice(3 * (1 * 4 + 2), 3 * (1 * 4 + 2) + 3).toSeq ==
      Seq[Byte](40, 50, 60))
    assert(up.getAs[Long]("checksum") ==
      px.map(_ & 0xff).map(_.toLong).sum)
    // undecodable payloads drop
    assert(Multimodal.resize(
      Multimodal.fromText(one, "doc_id", "text"), 2, 2).count() == 0)
  }

  test("frame sampling picks evenly spaced decoded rows") {
    val frames = Multimodal.sampleFrames(media, frames = 4).collect()
    val f1 = frames.filter(_.getAs[Long]("media_id") == 1L)
      .sortBy(_.getAs[Int]("frame_idx"))
    assert(f1.length == 4)
    // h = 9: rows 0, 2, 4, 6
    assert(f1.map(_.getAs[Int]("row_idx")).toSeq == Seq(0, 2, 4, 6))
    assert(f1.forall(_.getAs[Int]("n_bytes") == 27))
    val exp = (0 until 27).map(j => (7 * (3 * 2 * 9 + j) + 13) % 256)
      .sum.toLong
    assert(f1(1).getAs[Long]("checksum") == exp)
    // undecodable payloads drop
    assert(Multimodal.sampleFrames(
      Multimodal.fromText(docs, "doc_id", "text"), 2).count() == 0)
  }
}
