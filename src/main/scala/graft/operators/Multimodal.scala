package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with typed metadata;
  * decode / feature-extraction runs per partition so heavyweight codec
  * state is initialized once per task, not per row (the Scala analogue
  * of `mapInPandas` batch processing).
  *
  * The decode step itself is STUBBED with a deterministic fake (the
  * container has no image/audio codecs — see builder prompt): the
  * Spark-side contract — schema, batch iteration, partitioning, output
  * shape — is real and tested; swap `FakeCodec` for a real decoder
  * binding to productionize.
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

  case class MediaFeatures(media_id: Long, modality: String,
      n_bytes: Int, sha256: String, features: Array[Float])

  /** Deterministic stand-in for a real decoder: "features" are a fixed
    * fold of the payload bytes. Replace with e.g. a JNI codec binding;
    * the per-partition init/iteration contract stays identical. */
  object FakeCodec {
    def init(): FakeCodec.type = this   // heavyweight init goes here
    def decodeToFeatures(payload: Array[Byte], dims: Int): Array[Float] = {
      val out = new Array[Float](dims)
      var i = 0
      while (i < payload.length) {
        out(i % dims) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  /** Per-partition feature extraction over binary payloads. One codec
    * init per partition; rows stream through without materializing the
    * partition. */
  def extractFeatures(media: DataFrame, dims: Int = 8)
      : Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        val codec = FakeCodec.init()
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        rows.map { case (id, modality, payload) =>
          val sha = digest.digest(payload)
            .map(b => f"$b%02x").mkString
          digest.reset()
          MediaFeatures(id, modality, payload.length, sha,
            codec.decodeToFeatures(payload, dims))
        }
      }
  }

  /** Frame-sampling shape for video-like payloads: split the payload
    * into `frames` equal chunks and feature-extract each — the row
    * explodes into (media_id, frame_idx, n_bytes, features). n_bytes is
    * the slice length (deterministic, so the frame-slicing contract is
    * oracle-checkable even though features come from the stub codec). */
  def sampleFrames(media: DataFrame, frames: Int, dims: Int = 8)
      : DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val codec = FakeCodec.init()
        val chunk = math.max(1, payload.length / frames)
        (0 until frames).iterator.map { f =>
          val slice = payload.slice(f * chunk,
            math.min((f + 1) * chunk, payload.length))
          (id, f, slice.length, codec.decodeToFeatures(slice, dims))
        }
      }.toDF("media_id", "frame_idx", "n_bytes", "features")
  }

  /** Resize shape for image-like payloads: deterministic stride
    * sampling of the payload down to a w×h byte grid (the stub stands
    * in for a real scaler; per-partition iteration, output schema and
    * size contract are the real plumbing). Rows whose payload is
    * smaller than the target grid are dropped (can't upsample bytes). */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    require(w > 0 && h > 0 && w.toLong * h <= Int.MaxValue,
      s"resize grid $w x $h overflows")
    val spark = media.sparkSession
    import spark.implicits._
    val n = w * h
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // null payloads drop like too-small ones (the oracle's
        // octet_length(NULL) >= n is NULL → excluded, not a crash)
        rows.filter(r => r._2 != null && r._2.length >= n)
          .map { case (id, payload) =>
          val out = new Array[Byte](n)
          val stride = payload.length.toDouble / n
          var i = 0
          while (i < n) {
            out(i) = payload(math.min((i * stride).toInt,
              payload.length - 1))
            i += 1
          }
          (id, w, h, out)
          }
      }.toDF("media_id", "out_w", "out_h", "resized")
  }

  /** Synthesize a media table from any text column (for tests/benches:
    * payload = utf-8 bytes; deterministic). */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("media_id"), lit("image").as("modality"),
      lit("application/octet-stream").as("mime"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("int").as("duration_ms"))
}
