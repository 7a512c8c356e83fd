package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Config-driven line-stream source seam (SURVEY §2.1 S1). The
  * reference hardwires a TCP socket (master.py:330 socketTextStream);
  * production deployments read the same JSON-line stream from a file
  * drop directory or a Kafka topic. Every variant yields ONE string
  * column named `value`, so the downstream pipeline (parse → metrics →
  * state handlers) is source-agnostic — swapping transports is a config
  * change, not a code change.
  *
  * Config keys: `source` = socket|file|kafka (default socket), plus
  *  - socket: `host`, `port` — dev/demo transport (unreplayable; no
  *    offsets, so exactly-once recovery is impossible by construction)
  *  - file:   `path` (+ optional `maxFilesPerTrigger`, default 16) —
  *    replayable; the simplest production-grade drop-dir transport
  *  - kafka:  `kafka.bootstrap.servers`, `subscribe` (+ optional
  *    `startingOffsets`, default earliest) — the real prod transport;
  *    offset-tracked, so checkpoint recovery resumes exactly where it
  *    left off. Requires the spark-sql-kafka-0-10 connector jar on the
  *    classpath (not bundled here; see docs/MIGRATION.md §streaming).
  */
object LineSource {

  def apply(spark: SparkSession, conf: Map[String, String]): DataFrame = {
    val source = conf.getOrElse("source", "socket")
    def req(k: String): String = conf.getOrElse(k,
      throw new IllegalArgumentException(
        s"LineSource: missing required option '$k' for source '$source'"))
    source match {
      case "socket" =>
        spark.readStream.format("socket")
          .option("host", req("host")).option("port", req("port")).load()
      case "file" =>
        spark.readStream
          .option("maxFilesPerTrigger",
            conf.getOrElse("maxFilesPerTrigger", "16"))
          .text(req("path"))
          .select(col("value"))
      case "kafka" =>
        spark.readStream.format("kafka")
          .option("kafka.bootstrap.servers", req("kafka.bootstrap.servers"))
          .option("subscribe", req("subscribe"))
          .option("startingOffsets",
            conf.getOrElse("startingOffsets", "earliest"))
          .load()
          // Kafka rows are (key, value, topic, partition, offset, …)
          // binary; the pipeline wants the line text only
          .select(col("value").cast("string").as("value"))
      case other =>
        throw new IllegalArgumentException(
          s"LineSource: unknown source '$other' (expected socket|file|kafka)")
    }
  }
}
