package graft.fpl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Columnar ingest of the mixed match+event JSON line stream.
  *
  * The reference re-parses each line in every lambda (master.py:37,45,71,
  * 268,301,316); here each line is parsed exactly once with an explicit
  * schema and split by record type (F1/F2: presence of wyId / eventId,
  * master.py:32-46). Works identically for `spark.read.text` and
  * `spark.readStream` inputs — one source of truth for both paths.
  */
object Ingest {

  /** Parse raw JSON lines against the match∪event union schema. */
  def parse(lines: DataFrame): DataFrame =
    lines.select(from_json(col("value"), Schemas.unionSchema).as("r"))
      .select("r.*")

  /** F1: match records (wyId present). */
  def matches(parsed: DataFrame): DataFrame =
    parsed.filter(col("wyId").isNotNull)
      .select(Schemas.matchSchema.fieldNames.map(col).toSeq: _*)

  /** F2: event records (eventId present, and not a match record). */
  def events(parsed: DataFrame): DataFrame =
    parsed.filter(col("eventId").isNotNull && col("wyId").isNull)
      .select(Schemas.eventSchema.fieldNames.map(col).toSeq: _*)

  /** Dim loads with explicit schemas (reference infers, master.py:27-30 —
    * inference costs a full extra pass and is nondeterministic under
    * drift). */
  def players(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(Schemas.playerSchema).csv(path)

  def teams(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(Schemas.teamSchema).csv(path)
}
