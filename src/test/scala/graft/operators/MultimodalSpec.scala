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

  test("Y4M codec round-trips encode → decode, skips unknown header " +
      "params and FRAME params, and rejects malformations") {
    import Multimodal.Y4mCodec
    val v = Y4mCodec.Video(2, 2, 25, 1, Array(
      Array[Byte](1, 2, 3, 4), Array[Byte](5, 6, 7, 8)))
    val enc = Y4mCodec.encode(v)
    val back = Y4mCodec.decode(enc).get
    assert(back.width == 2 && back.height == 2 &&
      back.fpsNum == 25 && back.fpsDen == 1 &&
      back.frames.length == 2 &&
      back.frames.map(_.toSeq).toSeq == v.frames.map(_.toSeq).toSeq)
    // unknown header params (X extension) skip per spec; FRAME lines
    // may carry parameters after a space
    val hdr = "YUV4MPEG2 W2 H2 F25:1 Ip A1:1 Cmono Xgraft\n"
    val withParams = hdr.getBytes("US-ASCII") ++
      "FRAME Ffoo\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3, 4)
    assert(Y4mCodec.decode(withParams).exists(_.frames.length == 1))
    def mut(s: String) = Y4mCodec.decode(
      s.getBytes("US-ASCII") ++ Array[Byte](1, 2, 3, 4))
    assert(mut("YUV4MPEG3 W2 H2 F25:1 Cmono\nFRAME\n").isEmpty, "magic")
    assert(mut("YUV4MPEG2 W2 H2 F25:1\nFRAME\n").isEmpty,
      "absent C tag means C420 planes — must refuse, not mis-size")
    assert(mut("YUV4MPEG2 W2 H2 F25:1 C420\nFRAME\n").isEmpty, "C420")
    assert(mut("YUV4MPEG2 W2 H2 Fx:1 Cmono\nFRAME\n").isEmpty, "bad F")
    assert(mut("YUV4MPEG2 W2 F25:1 Cmono\nFRAME\n").isEmpty, "no H")
    assert(Y4mCodec.decode(enc.dropRight(1)).isEmpty, "truncated plane")
    assert(Y4mCodec.decode(enc ++ Array[Byte](9)).isEmpty,
      "trailing garbage")
    assert(Y4mCodec.decode(enc.take(enc.length - 5)).isEmpty,
      "partial trailing frame")
    assert(Y4mCodec.decode(null).isEmpty)
  }

  test("toY4m payloads decode to the documented deterministic luma; " +
      "video features match hand arithmetic") {
    // doc 1 "hello world" (11 bytes): shots = 2+1%3 = 3, perShot =
    // 4+11%3 = 6 → 18 frames, 36 + 18·70 = 1296 bytes, 720 ms
    val feats = Multimodal.extractVideoFeatures(
        Multimodal.toY4m(docs, "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val f1 = feats(1L)
    assert(f1.getInt(1) == 36 + 18 * 70 && f1.getInt(2) == 8 &&
      f1.getInt(3) == 8 && f1.getInt(4) == 25 && f1.getInt(5) == 1 &&
      f1.getInt(6) == 18 && f1.getLong(7) == 720L)
    // luma checksum by hand: Σ over f<18, j<64 of
    // (7j(s+1) + 13 + 97s) % 256, s = f/6
    var expect = 0L
    for (f <- 0 until 18; j <- 0 until 64)
      expect += (7L * j * (f / 6 + 1) + 13L + 97L * (f / 6)) % 256
    assert(f1.getLong(8) == expect, s"luma_sum ${f1.getLong(8)}")
    // frame hashes: within a shot identical, across shots different
    // for this id (hand-checkable because shot luma is a pure ramp)
    val fh = Multimodal.videoFrameHash(
        Multimodal.toY4m(docs.filter($"doc_id" === 1L), "doc_id", "text"))
      .orderBy($"frame_idx")
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(fh.length == 18)
    assert(fh.slice(0, 6).distinct.length == 1, "shot 0 not constant")
    assert(fh.slice(6, 12).distinct.length == 1, "shot 1 not constant")
    assert(fh(0) != fh(6) || fh(6) != fh(12),
      "all shots hashed identically — the cut fixture is degenerate")
  }

  test("WAV codec round-trips encode → decode, both bit depths") {
    import Multimodal.WavCodec
    val a16 = WavCodec.Audio(2, 16000, 16,
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)) // 2 frames × 2ch × 2B
    val b16 = WavCodec.decode(WavCodec.encode(a16)).get
    assert(b16.channels == 2 && b16.sampleRate == 16000 &&
      b16.bitsPerSample == 16 && b16.nFrames == 2 &&
      b16.data.toSeq == a16.data.toSeq)
    val a8 = WavCodec.Audio(1, 8000, 8, Array[Byte](0, 127, -128, -1))
    val b8 = WavCodec.decode(WavCodec.encode(a8)).get
    assert(b8.nFrames == 4 && b8.bitsPerSample == 8)
    // 8-bit samples are offset-128 unsigned; 16-bit signed LE
    assert(WavCodec.sample(b8, 0, 0) == 0 &&
      WavCodec.sample(b8, 3, 0) == 255)
    assert(WavCodec.sample(b16, 0, 1) == ((4 << 8) | 3))
  }

  test("WAV chunk walk skips unknown chunks WITH the odd-size pad " +
      "byte, and rejects malformations") {
    import Multimodal.WavCodec
    val good = WavCodec.encode(
      WavCodec.Audio(1, 8000, 16, Array[Byte](9, 0)))
    // splice a 3-byte junk chunk (odd → 1 pad byte) between WAVE and fmt
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0, 42, 42, 42, 0)
    val spliced = good.take(12) ++ junk ++ good.drop(12)
    assert(WavCodec.decode(spliced).exists(_.nFrames == 1),
      "pad-byte chunk walk must still find fmt/data")
    def corrupt(f: Array[Byte] => Array[Byte]) =
      WavCodec.decode(f(good.clone()))
    assert(corrupt(p => { p(0) = 'X'; p }).isEmpty, "bad RIFF magic")
    assert(corrupt(p => { p(20) = 3; p }).isEmpty, "non-PCM format tag")
    assert(corrupt(p => { p(32) = 9; p }).isEmpty, "blockAlign mismatch")
    assert(corrupt(_.dropRight(1)).isEmpty, "truncated data chunk")
    assert(WavCodec.decode(good.take(36)).isEmpty, "no data chunk")
    assert(WavCodec.decode(null).isEmpty)
  }

  test("toWav payloads decode to the documented deterministic PCM; " +
      "audio features match hand arithmetic") {
    val feats = Multimodal.extractAudioFeatures(
        Multimodal.toWav(docs, "doc_id", "text"))
      .collect().map(f => f.media_id -> f).toMap
    // doc 1: "hello world" = 11 bytes → frames 64+11%32=75, 2ch, 16kHz
    val f1 = feats(1L)
    assert(f1.channels.contains(2) && f1.sample_rate.contains(16000) &&
      f1.n_frames.contains(75L) && f1.n_bytes == 44 + 2 * 75 * 2 &&
      f1.duration_ms.contains(75L * 1000 / 16000))
    val exp1 = (0 until 150).map(j =>
      math.abs(((31L * j + 13L) % 65536) - 32768)).sum
    assert(f1.amp_sum.contains(exp1))
    // doc 2: "abc" → frames 64+3=67, 1ch, 24kHz
    val f2 = feats(2L)
    assert(f2.channels.contains(1) && f2.sample_rate.contains(24000) &&
      f2.n_frames.contains(67L))
    // corrupt + null payloads: envelope rows, no crash
    val mixed = Multimodal.fromText(docs, "doc_id", "text")
      .union(Seq((99L, "audio", "audio/wav", null.asInstanceOf[Array[Byte]],
        null.asInstanceOf[Integer], null.asInstanceOf[Integer],
        null.asInstanceOf[Integer]))
        .toDF("media_id", "modality", "mime", "payload", "width",
          "height", "duration_ms"))
    val env = Multimodal.extractAudioFeatures(mixed).collect()
    assert(env.length == 3 && env.forall(_.channels.isEmpty))
    assert(env.find(_.media_id == 99L).get.n_bytes == 0)
  }

  test("audio downsample keeps channel 0 of every 4th frame") {
    import Multimodal.WavCodec
    // 1ch 16-bit, 10 frames with values 0..9
    val data = (0 until 10).flatMap(v =>
      Seq((v & 0xff).toByte, 0.toByte)).toArray
    val one = Seq((7L, "audio", "audio/wav",
        WavCodec.encode(WavCodec.Audio(1, 8000, 16, data)),
        null.asInstanceOf[Integer], null.asInstanceOf[Integer],
        null.asInstanceOf[Integer]))
      .toDF("media_id", "modality", "mime", "payload", "width",
        "height", "duration_ms")
    val r = Multimodal.downsampleAudio(one, factor = 4).head()
    assert(r.getAs[Int]("out_rate") == 2000)
    assert(r.getAs[Long]("n_kept") == 3L) // frames 0, 4, 8
    assert(r.getAs[Long]("checksum") == 0L + 4 + 8)
    assert(r.getAs[Array[Byte]]("mono").toSeq ==
      Seq[Byte](0, 0, 4, 0, 8, 0))
    // undecodable payloads drop
    assert(Multimodal.downsampleAudio(
      Multimodal.fromText(docs, "doc_id", "text"), 2).count() == 0)
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
