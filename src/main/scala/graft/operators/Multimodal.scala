package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with typed metadata;
  * decode / feature-extraction runs per partition so heavyweight codec
  * state is initialized once per task, not per row (the Scala analogue
  * of `mapInPandas` batch processing).
  *
  * The decoder is a REAL image codec: binary netpbm ([[PpmCodec]],
  * PPM "P6"). The container ships no image libraries, and PPM is the
  * canonical library-free raster format — the header grammar (magic,
  * `#` comments, arbitrary whitespace-separated dimensions, maxval) and
  * the raw RGB plane are genuinely parsed, so malformed-magic,
  * truncated-raster and oversized-dimension failures are real decode
  * errors, not simulated ones. A production JPEG/PNG binding would
  * replace only [[PpmCodec]]; every operator keeps the same
  * per-partition init + streaming-iterator contract.
  */
object Multimodal {

  /** Typed envelope for a binary payload column. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType),   // image | audio | video
    StructField("mime", StringType),
    StructField("payload", BinaryType),
    StructField("width", IntegerType),     // metadata, nullable
    StructField("height", IntegerType),
    StructField("duration_ms", IntegerType)))

  /** Minimal real image codec: binary netpbm (PPM `P6`, 8-bit RGB). */
  object PpmCodec {
    /** Row-major RGB, 3 bytes per pixel. */
    final case class Image(width: Int, height: Int, maxval: Int,
        pixels: Array[Byte]) {
      require(pixels.length == 3 * width * height, "raster size mismatch")
    }

    /** Per-task init hook — a JNI/libjpeg binding would bind here. */
    def init(): PpmCodec.type = this

    def encode(img: Image): Array[Byte] = {
      val header = s"P6\n${img.width} ${img.height}\n${img.maxval}\n"
        .getBytes("US-ASCII")
      val out = new Array[Byte](header.length + img.pixels.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(img.pixels, 0, out, header.length,
        img.pixels.length)
      out
    }

    private def isSpace(b: Byte): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f'

    /** Parse a binary PPM. Grammar: `P6`, then three decimal fields
      * (width, height, maxval ≤ 255) separated by whitespace and/or
      * `#`-to-end-of-line comments, then exactly ONE whitespace byte,
      * then 3·w·h raw bytes. None on any malformation: wrong magic,
      * non-digit field, zero/negative or overflowing dimensions,
      * 2-byte maxval (>255), or a short raster. */
    def decode(payload: Array[Byte]): Option[Image] = {
      if (payload == null || payload.length < 2 ||
          payload(0) != 'P' || payload(1) != '6') return None
      var i = 2
      def skipSeparators(): Boolean = {
        var progressed = false
        var go = true
        while (go && i < payload.length) {
          if (isSpace(payload(i))) { i += 1; progressed = true }
          else if (payload(i) == '#') {
            while (i < payload.length && payload(i) != '\n') i += 1
            progressed = true
          } else go = false
        }
        progressed
      }
      def readField(): Int = {         // -1 on malformed
        if (!skipSeparators()) return -1
        var v = 0L
        var any = false
        while (i < payload.length &&
            payload(i) >= '0' && payload(i) <= '9') {
          v = v * 10 + (payload(i) - '0')
          any = true
          if (v > Int.MaxValue) return -1
          i += 1
        }
        if (any) v.toInt else -1
      }
      val w = readField()
      val h = readField()
      val mx = readField()
      if (w <= 0 || h <= 0 || mx <= 0 || mx > 255) return None
      if (i >= payload.length || !isSpace(payload(i))) return None
      i += 1
      val n = 3L * w * h
      if (n > payload.length - i) return None
      Some(Image(w, h, mx,
        java.util.Arrays.copyOfRange(payload, i, i + n.toInt)))
    }
  }

  case class MediaFeatures(media_id: Long, modality: String,
      n_bytes: Int, sha256: String, width: Option[Int],
      height: Option[Int], n_pixels: Option[Long],
      pixel_sum: Option[Long], features: Array[Float])

  /** Per-partition decode + feature extraction over binary payloads.
    * One codec/digest init per partition; rows stream through without
    * materializing the partition. Undecodable payloads keep their
    * envelope stats (bytes, sha) with null image fields and an empty
    * feature vector; a NULL payload gets a zero-byte envelope row —
    * corrupt blobs are data to route, not crashes. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        val codec = PpmCodec.init()
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        rows.map { case (id, modality, payload) =>
          if (payload == null)
            // null blob: envelope row with zero bytes, no sha, no raster
            MediaFeatures(id, modality, 0, "", None, None, None, None,
              Array.empty[Float])
          else {
            val sha = digest.digest(payload).map(b => f"$b%02x").mkString
            digest.reset()
            codec.decode(payload) match {
              case Some(img) =>
                val px = img.pixels
                var sumAll = 0L
                val chan = new Array[Long](3)
                var j = 0
                while (j < px.length) {
                  val v = px(j) & 0xff
                  sumAll += v
                  chan(j % 3) += v
                  j += 1
                }
                val nPix = img.width.toLong * img.height
                MediaFeatures(id, modality, payload.length, sha,
                  Some(img.width), Some(img.height), Some(nPix),
                  Some(sumAll),
                  Array((chan(0).toDouble / nPix).toFloat,
                    (chan(1).toDouble / nPix).toFloat,
                    (chan(2).toDouble / nPix).toFloat,
                    (sumAll.toDouble / (3 * nPix)).toFloat))
              case None =>
                MediaFeatures(id, modality, payload.length, sha,
                  None, None, None, None, Array.empty[Float])
            }
          }
        }
      }
  }

  /** Frame sampling over decoded images — the video-style "sample k
    * frames at even spacing" contract applied to the pixel-row axis:
    * frame f takes row `f·h/frames` of the decoded raster and emits its
    * 3·w bytes with a checksum. Undecodable payloads drop (they have no
    * raster to sample). */
  def sampleFrames(media: DataFrame, frames: Int): DataFrame = {
    require(frames > 0, "frames must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = PpmCodec.init()
        rows.flatMap { case (id, payload) =>
          codec.decode(payload).iterator.flatMap { img =>
            (0 until frames).iterator.map { f =>
              val row = f * img.height / frames
              val from = 3 * row * img.width
              var checksum = 0L
              var j = from
              while (j < from + 3 * img.width) {
                checksum += img.pixels(j) & 0xff
                j += 1
              }
              (id, f, row, 3 * img.width, checksum)
            }
          }
        }
      }.toDF("media_id", "frame_idx", "row_idx", "n_bytes", "checksum")
  }

  /** Real nearest-neighbor resize on the decoded raster: target pixel
    * (x, y) samples source pixel (x·srcW/w, y·srcH/h) — up- and
    * down-sampling both work, per channel. Emits the resized raw RGB
    * plane plus its byte checksum. Undecodable payloads drop. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    require(w > 0 && h > 0 && 3L * w * h <= Int.MaxValue,
      s"resize grid $w x $h overflows")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = PpmCodec.init()
        rows.flatMap { case (id, payload) =>
          codec.decode(payload).iterator.map { img =>
            val out = new Array[Byte](3 * w * h)
            var checksum = 0L
            var y = 0
            while (y < h) {
              val sy = y * img.height / h
              var x = 0
              while (x < w) {
                val sx = x * img.width / w
                val src = 3 * (sy * img.width + sx)
                val dst = 3 * (y * w + x)
                var c = 0
                while (c < 3) {
                  out(dst + c) = img.pixels(src + c)
                  checksum += img.pixels(src + c) & 0xff
                  c += 1
                }
                x += 1
              }
              y += 1
            }
            (id, w, h, out, checksum)
          }
        }
      }.toDF("media_id", "out_w", "out_h", "resized", "checksum")
  }

  /** Minimal real audio codec: RIFF/WAVE, integer PCM (format 1),
    * 8- or 16-bit. The chunk walk is a genuine RIFF parse — fmt/data
    * discovery, unknown-chunk skipping WITH the spec's odd-size pad
    * byte, field/consistency validation (blockAlign = channels·bytes,
    * byteRate = rate·blockAlign, data length a whole number of
    * frames) — so truncated data, a non-PCM format tag, or a corrupt
    * chunk header are real decode failures, exactly like PpmCodec's
    * malformed rasters. A production libsndfile/FFmpeg binding would
    * replace only this object. */
  object WavCodec {
    /** Interleaved PCM frames; `data` is the raw byte plane. */
    final case class Audio(channels: Int, sampleRate: Int,
        bitsPerSample: Int, data: Array[Byte]) {
      def blockAlign: Int = channels * bitsPerSample / 8
      def nFrames: Long = data.length.toLong / blockAlign
      require(bitsPerSample == 8 || bitsPerSample == 16, "8/16-bit only")
      require(channels > 0 && sampleRate > 0, "bad geometry")
      require(data.length % blockAlign == 0, "partial frame")
    }

    /** Per-task init hook — a native audio binding would bind here. */
    def init(): WavCodec.type = this

    private def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    private def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

    def encode(a: Audio): Array[Byte] = {
      val byteRate = a.sampleRate * a.blockAlign
      val out = java.nio.ByteBuffer.allocate(44 + a.data.length)
      out.put("RIFF".getBytes("US-ASCII"))
        .put(le32(36 + a.data.length))
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).put(le32(16))
        .put(le16(1)).put(le16(a.channels)).put(le32(a.sampleRate))
        .put(le32(byteRate)).put(le16(a.blockAlign))
        .put(le16(a.bitsPerSample))
        .put("data".getBytes("US-ASCII")).put(le32(a.data.length))
        .put(a.data)
      out.array()
    }

    private def u16(p: Array[Byte], i: Int): Int =
      (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    private def u32(p: Array[Byte], i: Int): Long =
      (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
        ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
    private def tag(p: Array[Byte], i: Int): String =
      new String(p, i, 4, "US-ASCII")

    /** Parse a RIFF/WAVE PCM payload; None on any malformation. The
      * fmt chunk must precede data (per spec); unknown chunks are
      * skipped with word alignment (odd sizes carry a pad byte). */
    def decode(payload: Array[Byte]): Option[Audio] = {
      if (payload == null || payload.length < 12 ||
          tag(payload, 0) != "RIFF" || tag(payload, 8) != "WAVE")
        return None
      var i = 12
      var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
      while (i + 8 <= payload.length) {
        val id = tag(payload, i)
        val size = u32(payload, i + 4)
        val body = i + 8
        // u32 yields [0, 2^32) longs, so the only oversize hazard is
        // the chunk running past the payload
        if (body + size > payload.length) return None
        id match {
          case "fmt " =>
            if (size < 16) return None
            val audioFormat = u16(payload, body)
            val channels = u16(payload, body + 2)
            val rate = u32(payload, body + 4)
            val byteRate = u32(payload, body + 8)
            val blockAlign = u16(payload, body + 12)
            val bits = u16(payload, body + 14)
            if (audioFormat != 1 || channels < 1 ||
                rate <= 0 || rate > Int.MaxValue ||
                (bits != 8 && bits != 16) ||
                blockAlign != channels * bits / 8 ||
                byteRate != rate * blockAlign) return None
            fmt = Some((channels, rate.toInt, bits))
          case "data" =>
            return fmt.flatMap { case (ch, rate, bits) =>
              val n = size.toInt
              if (n % (ch * bits / 8) != 0) None
              else Some(Audio(ch, rate, bits,
                java.util.Arrays.copyOfRange(payload, body, body + n)))
            }
          case _ => () // LIST, fact, cue … — skip
        }
        i = body + size.toInt + (size.toInt & 1) // RIFF pad byte
      }
      None // no data chunk
    }

    /** Sample value of frame `f`, channel `c`: signed for 16-bit,
      * offset-128 for 8-bit (both per the WAV spec). */
    def sample(a: Audio, f: Long, c: Int): Int =
      if (a.bitsPerSample == 16) {
        val i = (f * a.blockAlign + 2 * c).toInt
        u16(a.data, i).toShort.toInt
      } else a.data((f * a.blockAlign + c).toInt) & 0xff
  }

  case class AudioFeatures(media_id: Long, modality: String,
      n_bytes: Int, sha256: String, channels: Option[Int],
      sample_rate: Option[Int], bits: Option[Int],
      n_frames: Option[Long], duration_ms: Option[Long],
      amp_sum: Option[Long])

  /** Per-partition decode + feature extraction over WAV payloads —
    * the audio mirror of [[extractFeatures]]: one codec/digest init
    * per task, rows stream through, null payloads get a zero-byte
    * envelope, undecodable ones keep envelope stats with null audio
    * fields. `amp_sum` = Σ|sample| over every frame and channel
    * (signed 16-bit / offset-128 8-bit) — exact integer arithmetic,
    * which is what lets the oracle rebuild it in SQL. */
  def extractAudioFeatures(media: DataFrame): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        val codec = WavCodec.init()
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        rows.map { case (id, modality, payload) =>
          if (payload == null)
            AudioFeatures(id, modality, 0, "", None, None, None, None,
              None, None)
          else {
            val sha = digest.digest(payload).map(b => f"$b%02x").mkString
            digest.reset()
            codec.decode(payload) match {
              case Some(a) =>
                var amp = 0L
                var f = 0L
                while (f < a.nFrames) {
                  var c = 0
                  while (c < a.channels) {
                    val v = WavCodec.sample(a, f, c)
                    amp += math.abs(
                      if (a.bitsPerSample == 8) v - 128 else v)
                    c += 1
                  }
                  f += 1
                }
                AudioFeatures(id, modality, payload.length, sha,
                  Some(a.channels), Some(a.sampleRate),
                  Some(a.bitsPerSample), Some(a.nFrames),
                  Some(a.nFrames * 1000L / a.sampleRate), Some(amp))
              case None =>
                AudioFeatures(id, modality, payload.length, sha,
                  None, None, None, None, None, None)
            }
          }
        }
      }
  }

  /** Decimating downsample on decoded PCM: keep channel 0 of every
    * `factor`-th frame (the audio analogue of [[resize]]'s
    * nearest-neighbor grid). Emits the decimated mono plane plus the
    * Σ|sample| checksum the oracle rebuilds; undecodable payloads
    * drop. */
  def downsampleAudio(media: DataFrame, factor: Int): DataFrame = {
    require(factor > 0, "factor must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = WavCodec.init()
        rows.flatMap { case (id, payload) =>
          codec.decode(payload).iterator.map { a =>
            val kept = ((a.nFrames + factor - 1) / factor).toInt
            val bytesPer = a.bitsPerSample / 8
            val out = new Array[Byte](kept * bytesPer)
            var checksum = 0L
            var k = 0
            while (k < kept) {
              val f = k.toLong * factor
              val src = (f * a.blockAlign).toInt
              System.arraycopy(a.data, src, out, k * bytesPer, bytesPer)
              val v = WavCodec.sample(a, f, 0)
              checksum += math.abs(
                if (a.bitsPerSample == 8) v - 128 else v)
              k += 1
            }
            (id, a.sampleRate / factor, kept.toLong, out, checksum)
          }
        }
      }.toDF("media_id", "out_rate", "n_kept", "mono", "checksum")
  }

  /** Synthesize a table of REAL (decodable) PCM WAVs, deterministic
    * per row: channels 1 + id%2, rate 8000·(1 + id%3), 16-bit,
    * frames 64 + len(text)%32, sample j = ((31j + 13·id) mod 65536)
    * − 32768 over the interleaved sample axis — all exactly
    * reproducible in SQL, so decode results are oracle-checkable down
    * to the amplitude sums. */
  def toWav(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val codec = WavCodec.init()
        rows.map { case (id, text) =>
          val len = text.getBytes("UTF-8").length
          val channels = (1 + id % 2).toInt
          val rate = (8000 * (1 + id % 3)).toInt
          val frames = 64 + len % 32
          val n = frames * channels
          val data = new Array[Byte](2 * n)
          val seed = 13L * id
          var j = 0
          while (j < n) {
            val v = (((31L * j + seed) % 65536) - 32768).toInt
            data(2 * j) = (v & 0xff).toByte
            data(2 * j + 1) = ((v >> 8) & 0xff).toByte
            j += 1
          }
          (id, "audio", "audio/wav",
            codec.encode(WavCodec.Audio(channels, rate, 16, data)),
            Option.empty[Int], Option.empty[Int],
            Some((frames.toLong * 1000 / rate).toInt))
        }
      }.toDF("media_id", "modality", "mime", "payload", "width",
        "height", "duration_ms")
  }

  /** Synthesize REAL (decodable) PCM WAV CHIRPS — same envelope
    * parameters as [[toWav]] (channels 1 + id%2, rate 8000·(1+id%3),
    * 16-bit, frames 64 + len%32) but sample j =
    * ((31·j² + 13·id) mod 65536) − 32768: quadratic phase, so the
    * waveform sweeps instead of ramping. Exists because [[toWav]]'s
    * linear ramp is DEGENERATE for amplitude fingerprints — over ≤95
    * frames the ramp moves only ~9% of the sample range, every clip's
    * loudness profile is monotone, and all 500 sf0.01 clips collapse
    * to ONE energy-profile hash (measured). The chirp's |sample|
    * profile wraps several times per clip at a seed-dependent phase,
    * restoring per-clip structure while staying exactly reproducible
    * in SQL (j ≤ 190 ⇒ 31·j² ≤ 1.12·10⁶, BIGINT-exact). */
  def toWavChirp(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val codec = WavCodec.init()
        rows.map { case (id, text) =>
          val len = text.getBytes("UTF-8").length
          val channels = (1 + id % 2).toInt
          val rate = (8000 * (1 + id % 3)).toInt
          val frames = 64 + len % 32
          val n = frames * channels
          val data = new Array[Byte](2 * n)
          val seed = 13L * id
          var j = 0
          while (j < n) {
            val v = (((31L * j * j + seed) % 65536) - 32768).toInt
            data(2 * j) = (v & 0xff).toByte
            data(2 * j + 1) = ((v >> 8) & 0xff).toByte
            j += 1
          }
          (id, "audio", "audio/wav",
            codec.encode(WavCodec.Audio(channels, rate, 16, data)),
            Option.empty[Int], Option.empty[Int],
            Some((frames.toLong * 1000 / rate).toInt))
        }
      }.toDF("media_id", "modality", "mime", "payload", "width",
        "height", "duration_ms")
  }

  /** Synthesize a media table from any text column: the payload is the
    * raw utf-8 bytes (an OPAQUE blob — exercises the undecodable path
    * and envelope stats). */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("media_id"), lit("image").as("modality"),
      lit("application/octet-stream").as("mime"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("int").as("duration_ms"))

  /** Synthesize a table of REAL (decodable) PPM images, deterministic
    * per row: width 8 + id%8, height 8 + len(text)%5, pixel byte j =
    * (7·j + 13·id) mod 256 — all exactly reproducible in SQL, so decode
    * results are oracle-checkable down to the pixel sums. */
  def toPpm(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val codec = PpmCodec.init()
        rows.map { case (id, text) =>
          val len = text.getBytes("UTF-8").length
          val w = (8 + id % 8).toInt
          val h = (8 + len % 5).toInt
          val px = new Array[Byte](3 * w * h)
          val seed = 13L * id
          var j = 0
          while (j < px.length) {
            px(j) = ((7L * j + seed) % 256).toByte
            j += 1
          }
          (id, "image", "image/x-portable-pixmap",
            codec.encode(PpmCodec.Image(w, h, 255, px)),
            Some(w), Some(h), Option.empty[Int])
        }
      }.toDF("media_id", "modality", "mime", "payload", "width",
        "height", "duration_ms")
  }

  /** Brightness-shift edit through the REAL codec path (decode → add
    * `delta` to every RGB byte, clamped at maxval — a genuine exposure
    * edit, clipping included → re-encode). Exists for the r12
    * planted-recall gates: aHash's threshold is EXACTLY invariant to
    * an unclamped uniform shift (every cell g gains 3δ, Σg gains
    * 64·3δ — the inequality 64·g ≥ Σg is unchanged) and only
    * APPROXIMATELY invariant once clipping bites the bright tail;
    * mm_phash_shift_recall measures that residual instead of trusting
    * the algebra. Output is (media_id, payload) — the hash functions'
    * input contract. */
  def brightnessShift(media: DataFrame, delta: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = PpmCodec.init()
        rows.flatMap { case (id, payload) =>
          codec.decode(payload).iterator.map { img =>
            val out = new Array[Byte](img.pixels.length)
            var j = 0
            while (j < out.length) {
              out(j) = math.min(img.maxval,
                (img.pixels(j) & 0xff) + delta).toByte
              j += 1
            }
            (id, codec.encode(
              PpmCodec.Image(img.width, img.height, img.maxval, out)))
          }
        }
      }.toDF("media_id", "payload")
  }

  /** Gain edit through the REAL WAVE path (decode → scale every
    * 16-bit sample v → v·num DIV den, truncating toward zero, clamped
    * to the sample range → re-encode). For num/den = 1/2 no clamp can
    * fire and |v DIV 2| = |v| DIV 2 exactly (truncation toward zero
    * is sign-symmetric), which is what lets the SQL rebuild mirror
    * the edit with plain integer division — the audio leg of the r12
    * recall plants: [[audioHash]]'s cross-multiplied mean bits are
    * exactly gain-invariant under REAL scaling and only approximately
    * under integer quantization; mm_audio_gain_recall measures the
    * residual. 16-bit PCM only (the only depth the synthesizers
    * emit); 8-bit clips would need the offset-128 convention. */
  def audioGain(media: DataFrame, num: Int, den: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = WavCodec.init()
        rows.flatMap { case (id, payload) =>
          codec.decode(payload).iterator.map { a =>
            require(a.bitsPerSample == 16,
              s"audioGain: clip $id is ${a.bitsPerSample}-bit; only " +
                "16-bit PCM is supported")
            val out = new Array[Byte](a.data.length)
            var i = 0
            while (i < a.data.length) {
              val v = ((a.data(i) & 0xff) |
                ((a.data(i + 1) & 0xff) << 8)).toShort.toInt
              val g = math.max(-32768, math.min(32767,
                v * num / den))
              out(i) = (g & 0xff).toByte
              out(i + 1) = ((g >> 8) & 0xff).toByte
              i += 2
            }
            (id, codec.encode(
              WavCodec.Audio(a.channels, a.sampleRate, 16, out)))
          }
        }
      }.toDF("media_id", "payload")
  }

  /** 64-bit average hash (aHash) over the DECODED raster — the
    * classic perceptual fingerprint: nearest-neighbor sample to an
    * 8×8 grid (the [[resize]] sampling arithmetic, sy = y·H/8,
    * sx = x·W/8, integer), per-cell brightness g = r+g+b (0..765,
    * exact integer), threshold each cell against the grid mean as
    * `64·g ≥ Σg` (cross-multiplied — no division anywhere), and pack
    * the 64 bits as four 16-bit BAND values plus the two 32-bit
    * halves. The threshold is brightness-shift invariant by algebra
    * (g+δ on every cell shifts Σg by 64δ — the inequality is
    * unchanged), which is why aHash survives exposure edits.
    *
    * The 4×16 band split exists for the Hamming join downstream: any
    * pair within Hamming distance ≤ 3 shares at least one EXACT band
    * (4 bands, ≤3 differing bits — pigeonhole), so banded blocking at
    * that radius has recall 1.0 as a THEOREM, not a measurement. At
    * larger corpora the band count/width grows with log₂ n to keep
    * bucket collisions bounded — same knob as the minhash families.
    *
    * mapPartitions is the house-legitimate codec path (per-task codec
    * init), identical to [[extractFeatures]]/[[resize]]. */
  def perceptualHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val grid = 8
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = PpmCodec.init()
        rows.flatMap { case (id, payload) =>
          codec.decode(payload).iterator.map { img =>
            val g = new Array[Long](grid * grid)
            var t = 0L
            var y = 0
            while (y < grid) {
              val sy = y * img.height / grid
              var x = 0
              while (x < grid) {
                val sx = x * img.width / grid
                val src = 3 * (sy * img.width + sx)
                val s = (img.pixels(src) & 0xff) +
                  (img.pixels(src + 1) & 0xff) +
                  (img.pixels(src + 2) & 0xff)
                g(y * grid + x) = s
                t += s
                x += 1
              }
              y += 1
            }
            val bands = new Array[Long](4)
            var ones = 0L
            var i = 0
            while (i < grid * grid) {
              if (g(i) * (grid * grid) >= t) {
                bands(i / 16) |= 1L << (i % 16)
                ones += 1
              }
              i += 1
            }
            (id, img.width, img.height,
              bands(0), bands(1), bands(2), bands(3), ones)
          }
        }
      }.toDF("media_id", "w", "h", "b0", "b1", "b2", "b3", "n_ones")
  }

  /** 64-bit energy-profile hash over the DECODED PCM — the audio
    * analog of [[perceptualHash]] (an aHash over the loudness curve,
    * the shape a chromaprint-style fingerprint reduces to for
    * amplitude features): channel-0 frames map onto 64 time windows
    * (window k of frame f = f·64 DIV nFrames — integer, exact), each
    * window accumulates Σ|sample| and its frame count, and the bit is
    * the MEAN comparison cross-multiplied to stay divisionless —
    * `e_k·n ≥ Σe·cnt_k` (windows hold unequal frame counts when
    * nFrames isn't a multiple of 64, so comparing sums would bias
    * long windows; comparing means via cross-multiplication keeps the
    * exact-integer discipline). Bits pack as 4×16-bit bands for the
    * same pigeonhole-lossless Hamming ≤ 3 banded join the image
    * family uses. Gain-invariance note: scaling every |sample| by c
    * scales both sides by c — the profile survives volume changes,
    * the same algebra as aHash's brightness-shift invariance.
    * Overflow: e_k·n ≤ 32768·nFrames² — BIGINT-exact to ~10⁷ frames
    * per clip. mapPartitions is the house-legitimate codec path.
    *
    * PRECONDITION (ADVICE-r11): nFrames ≥ 64, enforced loudly. A clip
    * shorter than the window count leaves windows EMPTY, and the
    * Scala side's empty-window bit (0·n ≥ tot·0 ⇒ 1) silently
    * diverges from the SQL rebuild (no row ⇒ bit 0). Every in-repo
    * synthesizer guarantees frames ≥ 64; other media sources must
    * pad or be filtered before hashing, and this require makes that
    * contract fail-fast instead of hash-mismatch-later. */
  def audioHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = WavCodec.init()
        rows.flatMap { case (id, payload) =>
          codec.decode(payload).iterator.map { a =>
            val n = a.nFrames.toInt
            require(n >= 64, s"audioHash: clip $id has $n frames < 64 " +
              "windows — empty windows would diverge from the SQL " +
              "rebuild (see scaladoc); pad or filter short clips first")
            val e = new Array[Long](64)
            val cnt = new Array[Long](64)
            var tot = 0L
            var f = 0
            while (f < n) {
              val k = (f.toLong * 64 / n).toInt
              val v = WavCodec.sample(a, f, 0)
              val av =
                math.abs(if (a.bitsPerSample == 8) v - 128 else v).toLong
              e(k) += av
              cnt(k) += 1
              tot += av
              f += 1
            }
            val bands = new Array[Long](4)
            var ones = 0L
            var k = 0
            while (k < 64) {
              if (e(k) * n >= tot * cnt(k)) {
                bands(k / 16) |= 1L << (k % 16)
                ones += 1
              }
              k += 1
            }
            (id, a.nFrames, bands(0), bands(1), bands(2), bands(3), ones)
          }
        }
      }.toDF("media_id", "n_frames", "b0", "b1", "b2", "b3", "n_ones")
  }

  /** Minimal real VIDEO codec: YUV4MPEG2 (the uncompressed interchange
    * format every FFmpeg build reads/writes), mono colorspace — a
    * stream header line (`YUV4MPEG2 W.. H.. F..:.. Ip A1:1 Cmono`)
    * followed by `FRAME`-delimited raw luma planes. The parse is a
    * genuine y4m walk: token scan of the header with W/H/F/C parameter
    * extraction and unknown-parameter skipping (I/A/X tags pass
    * through, per spec), explicit Cmono requirement (an absent C tag
    * means C420 per spec — planes we do not model — so it fails
    * loudly rather than mis-sizing frames), FRAME-line validation
    * including optional frame parameters, and whole-plane length
    * checks — truncated planes, a missing header token, or trailing
    * garbage are real decode failures, exactly like PpmCodec's
    * malformed rasters and WavCodec's corrupt chunks. A production
    * FFmpeg/GStreamer binding would replace only this object. */
  object Y4mCodec {
    /** Mono y4m stream: `frames` are w·h luma planes. */
    final case class Video(width: Int, height: Int, fpsNum: Int,
        fpsDen: Int, frames: Array[Array[Byte]]) {
      require(width > 0 && height > 0 && fpsNum > 0 && fpsDen > 0,
        "bad geometry")
      require(frames.nonEmpty, "empty stream")
      require(frames.forall(_.length == width * height), "partial plane")
    }

    /** Per-task init hook — a native video binding would bind here. */
    def init(): Y4mCodec.type = this

    def encode(v: Video): Array[Byte] = {
      val header = s"YUV4MPEG2 W${v.width} H${v.height} " +
        s"F${v.fpsNum}:${v.fpsDen} Ip A1:1 Cmono\n"
      val hb = header.getBytes("US-ASCII")
      val fm = "FRAME\n".getBytes("US-ASCII")
      val plane = v.width * v.height
      val out = java.nio.ByteBuffer.allocate(
        hb.length + v.frames.length * (fm.length + plane))
      out.put(hb)
      v.frames.foreach { f => out.put(fm); out.put(f) }
      out.array()
    }

    /** Parse a y4m payload; None on any malformation. */
    def decode(payload: Array[Byte]): Option[Video] = {
      if (payload == null || payload.length < 10) return None
      val nl = payload.indexOf('\n'.toByte)
      if (nl < 0) return None
      val toks = new String(payload, 0, nl, "US-ASCII").split(" ")
      if (toks.isEmpty || toks(0) != "YUV4MPEG2") return None
      var w = -1; var h = -1; var fn = -1; var fd = -1
      var cs: String = null // absent C tag = C420 per spec, not mono
      var bad = false
      var i = 1
      while (i < toks.length) {
        val t = toks(i)
        if (t.nonEmpty) t.charAt(0) match {
          case 'W' => t.drop(1).toIntOption
            .fold { bad = true } (w = _)
          case 'H' => t.drop(1).toIntOption
            .fold { bad = true } (h = _)
          case 'F' =>
            val p = t.drop(1).split(":", 2)
            if (p.length != 2) bad = true
            else {
              p(0).toIntOption.fold { bad = true } (fn = _)
              p(1).toIntOption.fold { bad = true } (fd = _)
            }
          case 'C' => cs = t.drop(1)
          case _ => () // I (interlace), A (aspect), X (extension): skip
        }
        i += 1
      }
      if (bad || w <= 0 || h <= 0 || fn <= 0 || fd <= 0 || cs != "mono")
        return None
      // ADVICE-r12: W·H is computed in Int below — an adversarial
      // header (W46341 H46341, W65536 H65536) overflows the plane size
      // to a negative or tiny value, turning "None on any malformation"
      // into an Arrays.copyOfRange throw or silently-empty frames.
      // Guard the geometry in Long first so oversized headers fail soft
      // like every other malformation (any plane over Int.MaxValue
      // cannot be addressed in a JVM byte array anyway).
      if (w.toLong * h.toLong > Int.MaxValue.toLong) return None
      val plane = w * h
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var pos = nl + 1
      while (pos < payload.length) {
        val lineEnd = payload.indexOf('\n'.toByte, pos)
        if (lineEnd < 0) return None
        val line = new String(payload, pos, lineEnd - pos, "US-ASCII")
        if (line != "FRAME" && !line.startsWith("FRAME ")) return None
        val body = lineEnd + 1
        if (body + plane > payload.length) return None
        frames += java.util.Arrays.copyOfRange(payload, body, body + plane)
        pos = body + plane
      }
      if (frames.isEmpty) return None
      Some(Video(w, h, fn, fd, frames.toArray))
    }
  }

  /** Synthesize a table of REAL (decodable) y4m videos, deterministic
    * per row and exactly reproducible in SQL: 8×8 mono at 25:1 fps,
    * (2 + id%3) shots × (4 + len(text)%3) frames per shot, and luma
    * pixel j of a frame in shot s = (7·j·(s+1) + 13·id + 97·s) mod
    * 256 — frames within a shot are IDENTICAL (the idealized hard-cut
    * fixture: scene-cut detection then has exact ground truth, the
    * toPpm/toWavChirp determinism discipline on the time axis), and
    * consecutive shots change both the spatial gradient slope and the
    * brightness offset, the two things a real cut changes. */
  def toY4m(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val codec = Y4mCodec.init()
        rows.map { case (id, text) =>
          val len = text.getBytes("UTF-8").length
          val shots = (2 + id % 3).toInt
          val perShot = 4 + len % 3
          val frames = Array.tabulate(shots * perShot) { f =>
            val s = f / perShot
            val px = new Array[Byte](64)
            var j = 0
            while (j < 64) {
              px(j) = ((7L * j * (s + 1) + 13L * id + 97L * s) % 256).toByte
              j += 1
            }
            px
          }
          val nf = shots * perShot
          (id, "video", "video/x-yuv4mpeg",
            codec.encode(Y4mCodec.Video(8, 8, 25, 1, frames)),
            Some(8), Some(8), Some(nf * 1000 / 25))
        }
      }.toDF("media_id", "modality", "mime", "payload", "width",
        "height", "duration_ms")
  }

  /** Brightness-shift edit through the REAL y4m codec path (decode →
    * add `delta` to every luma byte, clamped at 255 — a genuine
    * exposure edit, clipping included → re-encode). The video twin of
    * [[brightnessShift]]: aHash's threshold is EXACTLY invariant to
    * an unclamped uniform shift (64·(g+δ) ≥ Σg+64δ ⟺ 64·g ≥ Σg) and
    * only approximately invariant once clipping bites the bright
    * tail; mm_video_shift_recall measures that residual per frame
    * instead of trusting the algebra. */
  def lumaShift(media: DataFrame, delta: Int): DataFrame = {
    require(delta >= 0 && delta <= 255, s"bad luma delta $delta")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = Y4mCodec.init()
        rows.flatMap { case (id, payload) =>
          codec.decode(payload).iterator.map { v =>
            val shifted = v.frames.map(_.map { b =>
              math.min((b & 0xff) + delta, 255).toByte
            })
            (id, "video", "video/x-yuv4mpeg",
              codec.encode(v.copy(frames = shifted)),
              Some(v.width), Some(v.height),
              Some((v.frames.length.toLong * 1000 * v.fpsDen /
                v.fpsNum).toInt))
          }
        }
      }.toDF("media_id", "modality", "mime", "payload", "width",
        "height", "duration_ms")
  }

  /** Typed metadata + whole-stream checksum through the REAL y4m
    * decode: geometry, frame rate, frame count, duration from the
    * rate, and Σ luma over every plane (proves the full stream was
    * actually walked, not just the header). Undecodable payloads
    * drop. */
  def extractVideoFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = Y4mCodec.init()
        rows.flatMap { case (id, payload) =>
          codec.decode(payload).iterator.map { v =>
            var luma = 0L
            v.frames.foreach { f =>
              var j = 0
              while (j < f.length) { luma += f(j) & 0xff; j += 1 }
            }
            (id, payload.length, v.width, v.height, v.fpsNum, v.fpsDen,
              v.frames.length,
              v.frames.length.toLong * 1000 * v.fpsDen / v.fpsNum, luma)
          }
        }
      }.toDF("media_id", "n_bytes", "width", "height", "fps_num",
        "fps_den", "n_frames", "duration_ms", "luma_sum")
  }

  /** Per-frame 64-bit perceptual hash through the real y4m decode —
    * the aHash algebra applied per frame: an 8×8 nearest-neighbor
    * sample of the luma plane (cell (y,x) reads pixel (y·h/8, x·w/8);
    * at the fixture's native 8×8 geometry the sample is the identity,
    * same as mm_phash at its native sizes), bit = divisionless mean
    * threshold 64·g ≥ Σg, 4×16-bit band packing for the pigeonhole-
    * lossless Hamming ≤ 3 banded join. One decode per video, frames
    * emitted from the same pass — scan-bound, no shuffle before the
    * per-frame row. */
  def videoFrameHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = Y4mCodec.init()
        rows.flatMap { case (id, payload) =>
          codec.decode(payload).iterator.flatMap { v =>
            v.frames.iterator.zipWithIndex.map { case (plane, fi) =>
              val g = new Array[Long](64)
              var tot = 0L
              var y = 0
              while (y < 8) {
                val sy = y * v.height / 8
                var x = 0
                while (x < 8) {
                  val sx = x * v.width / 8
                  val px = (plane(sy * v.width + sx) & 0xff).toLong
                  g(8 * y + x) = px
                  tot += px
                  x += 1
                }
                y += 1
              }
              val bands = new Array[Long](4)
              var ones = 0L
              var k = 0
              while (k < 64) {
                if (64L * g(k) >= tot) {
                  bands(k / 16) |= 1L << (k % 16)
                  ones += 1
                }
                k += 1
              }
              (id, fi, bands(0), bands(1), bands(2), bands(3), ones)
            }
          }
        }
      }.toDF("media_id", "frame_idx", "b0", "b1", "b2", "b3", "n_ones")
  }
}
