package graft.fpl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Match-structure flattens (reference G1-G3, master.py:261-310 and
  * ui.py:139-184) — pure `explode` + higher-order functions; no custom
  * Generator needed.
  */
object Flatten {

  /** Explode the dynamic-keyed teamsData map into one row per team. */
  private def teams(matches: DataFrame): DataFrame =
    matches.select(
      col("wyId").as("matchId"), col("gameweek"),
      explode(col("teamsData")).as(Seq("teamKey", "td")))

  /** G2: (matchId, playerId, teamId) for every squad member — lineup ∪
    * bench (reference getTeamIDforPlayer master.py:294-310). */
  def playerTeam(matches: DataFrame): DataFrame =
    teams(matches).select(
      col("matchId"), col("gameweek"),
      col("td.teamId").as("teamId"),
      explode(concat(
        col("td.formation.lineup.playerId"),
        col("td.formation.bench.playerId"))).as("playerId"))

  /** G1: per-match on-pitch interval per player (reference
    * getPlayerListFromMatch master.py:261-292): starters play
    * [0, subbed-out minute | 90]; bench play [subbed-in minute, 90] or
    * [-1,-1] if never fielded. Interval arithmetic via a left join
    * against the exploded substitution list — the as-of-like logic of
    * the system. */
  def playerMinutes(matches: DataFrame): DataFrame = {
    val t = teams(matches)
    // The substitution list lives in the same match row as the squads, so
    // in/out minutes are higher-order array lookups — zero joins, zero
    // shuffles, and therefore streaming-safe (no stream-stream join).
    def subMinute(field: String): Column =
      get(filter(col("subs"),
        s => s.getField(field) === col("playerId")), lit(0))
        .getField("minute")
    val starters = t.select(col("matchId"), col("td.teamId").as("teamId"),
      col("td.formation.substitutions").as("subs"),
      explode(col("td.formation.lineup.playerId")).as("playerId"))
      .withColumn("isStarter", lit(true))
    val bench = t.select(col("matchId"), col("td.teamId").as("teamId"),
      col("td.formation.substitutions").as("subs"),
      explode(col("td.formation.bench.playerId")).as("playerId"))
      .withColumn("isStarter", lit(false))
    starters.unionByName(bench)
      .select(
        col("matchId"), col("teamId"), col("playerId"), col("isStarter"),
        when(col("isStarter"), lit(0))
          .otherwise(coalesce(subMinute("playerIn"), lit(-1)))
          .as("inMinute"),
        when(col("isStarter"), coalesce(subMinute("playerOut"), lit(90)))
          .otherwise(when(subMinute("playerIn").isNotNull, lit(90))
            .otherwise(lit(-1))).as("outMinute"),
        // "played the whole match without substitution" = absent from
        // the substitution list entirely — a starter subbed out at
        // exactly minute 90 does NOT qualify (spec §1c, docs/Specs.pdf
        // p.6), so this cannot be derived from outMinute == 90.
        (col("isStarter") && subMinute("playerOut").isNull)
          .as("neverSubstituted"))
      .withColumn("minutesPlayed",
        when(col("inMinute") === -1, lit(0))
          .otherwise(col("outMinute") - col("inMinute")))
  }

  /** G3: match-detail flatten — per squad member goals/own-goals/cards
    * from the lineup/bench structs. Per SURVEY §2.9 Q4 we use the real
    * card counters (the reference appends every name unconditionally). */
  def matchSquadStats(matches: DataFrame): DataFrame =
    teams(matches).select(
        col("matchId"), col("td.teamId").as("teamId"),
        explode(concat(col("td.formation.lineup"),
          col("td.formation.bench"))).as("m"))
      .select(
        col("matchId"), col("teamId"),
        col("m.playerId").as("playerId"),
        coalesce(col("m.goals").cast("int"), lit(0)).as("goals"),
        coalesce(col("m.ownGoals").cast("int"), lit(0)).as("ownGoals"),
        coalesce(col("m.yellowCards").cast("int"), lit(0)).as("yellowCards"),
        coalesce(col("m.redCards").cast("int"), lit(0)).as("redCards"))
}
