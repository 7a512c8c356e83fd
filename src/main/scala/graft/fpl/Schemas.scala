package graft.fpl

import org.apache.spark.sql.types._

/** Explicit schemas for the football-stream domain.
  *
  * The reference parses every record with schemaless `json.loads` per
  * lambda (reference master.py:37,45,71); we declare the shapes once
  * (FIXTURES.md A3/A4, derived from docs/Specs.pdf pp.2-3) so ingest is
  * a single columnar `from_json` and drift lands in `_corrupt_record`.
  */
object Schemas {

  /** Tag list entries: {"id": 101} … */
  val tagType: ArrayType = ArrayType(StructType(Seq(
    StructField("id", IntegerType))))

  /** Event record — detected by the presence of `eventId`
    * (reference master.py:40-46). */
  val eventSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("eventId", IntegerType),
    StructField("eventName", StringType),
    StructField("subEventId", IntegerType),
    StructField("subEventName", StringType),
    StructField("matchId", LongType),
    StructField("matchPeriod", StringType),
    StructField("eventSec", DoubleType),
    StructField("playerId", LongType),
    StructField("teamId", LongType),
    StructField("tags", tagType),
    StructField("positions", ArrayType(StructType(Seq(
      StructField("x", IntegerType), StructField("y", IntegerType)))))))

  /** Per-player lineup/bench entry; wyscout encodes counters as strings. */
  val squadMemberType: StructType = StructType(Seq(
    StructField("playerId", LongType),
    StructField("goals", StringType),
    StructField("ownGoals", StringType),
    StructField("yellowCards", StringType),
    StructField("redCards", StringType)))

  val substitutionType: StructType = StructType(Seq(
    StructField("playerIn", LongType),
    StructField("playerOut", LongType),
    StructField("minute", IntegerType)))

  /** `teamsData` is keyed by *dynamic* teamId strings — the one genuinely
    * map-typed column in the system (reference master.py:270,303). */
  val teamDataType: StructType = StructType(Seq(
    StructField("hasFormation", IntegerType),
    StructField("score", IntegerType),
    StructField("scoreET", IntegerType),
    StructField("scoreHT", IntegerType),
    StructField("scoreP", IntegerType),
    StructField("side", StringType),
    StructField("teamId", LongType),
    StructField("coachId", LongType),
    StructField("formation", StructType(Seq(
      StructField("lineup", ArrayType(squadMemberType)),
      StructField("bench", ArrayType(squadMemberType)),
      StructField("substitutions", ArrayType(substitutionType)))))))

  /** Match record — detected by the presence of `wyId`
    * (reference master.py:32-38). */
  val matchSchema: StructType = StructType(Seq(
    StructField("wyId", LongType),
    StructField("competitionId", LongType),
    StructField("date", StringType),
    StructField("dateutc", StringType),
    StructField("duration", StringType),
    StructField("gameweek", IntegerType),
    StructField("label", StringType),
    StructField("roundId", LongType),
    StructField("seasonId", LongType),
    StructField("status", StringType),
    StructField("venue", StringType),
    StructField("winner", LongType),
    StructField("teamsData", MapType(StringType, teamDataType))))

  /** Union schema for a mixed match+event line stream: one permissive
    * `from_json`, then record-type split on wyId/eventId nullness. */
  val unionSchema: StructType = StructType(
    (matchSchema.fields ++ eventSchema.fields)
      .groupBy(_.name).map(_._2.head).toSeq
      .sortBy(_.name))

  /** Dim: players.csv (reference data/players.csv, 650 rows). */
  val playerSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("birthArea", StringType),
    StructField("birthDate", DateType),
    StructField("foot", StringType),
    StructField("role", StringType),
    StructField("height", IntegerType),
    StructField("passportArea", StringType),
    StructField("weight", IntegerType),
    StructField("Id", LongType)))

  /** Dim: teams.csv (reference data/teams.csv, 20 rows). */
  val teamSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("Id", LongType)))
}
