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
}
