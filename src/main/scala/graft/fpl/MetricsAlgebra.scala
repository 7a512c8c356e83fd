package graft.fpl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The event→metric algebra (reference `getMetrics` master.py:48-138 +
  * `metricsCounterCalc` master.py:140-175 + `getFinalMetrics`
  * master.py:177-212; semantics authoritative in docs/Specs.pdf pp.4-5).
  *
  * Everything is a pure `Column` expression — zero UDFs, fully inside
  * whole-stage codegen, identical for `spark.read` and `spark.readStream`
  * inputs. Per SURVEY.md §2.9 Q1 we take the spec: goal/own-goal tags
  * count on ANY event type (the reference's catch-all branch has an
  * arity bug that silently drops them).
  *
  * Event ids: 1 duel, 2 foul, 3 free kick (subEventId 35 = penalty),
  * 8 pass, 10 shot. Tag ids: 101 goal, 102 own goal, 302 key pass,
  * 701 lost, 702 neutral, 703 won, 1801 accurate/on-target, 1802
  * inaccurate.
  */
object MetricsAlgebra {

  /** Tag membership — `exists` over the tag struct array (C2). */
  def hasTag(tagId: Int): Column =
    exists(col("tags"), t => t.getField("id") === tagId)

  private def b(c: Column): Column = c.cast("int")

  /** The 17 per-event counter columns, one struct-free select list.
    * Names are the columns `perMatchCounters` sums. */
  def counterColumns: Seq[(String, Column)] = {
    val isPass = col("eventId") === 8
    val isDuel = col("eventId") === 1
    val isShot = col("eventId") === 10
    val isFreeKick = col("eventId") === 3
    val isFoul = col("eventId") === 2
    val accurate = hasTag(1801)
    val keyPass = hasTag(302)
    val goal = hasTag(101)
    Seq(
      "accurate_normal_passes" -> b(isPass && accurate && !keyPass),
      "accurate_key_passes"    -> b(isPass && accurate && keyPass),
      "normal_passes"          -> b(isPass && !keyPass),
      "key_passes"             -> b(isPass && keyPass),
      "duels_won"              -> b(isDuel && hasTag(703)),
      "neutral_duels"          -> b(isDuel && hasTag(702)),
      "total_duels"            -> b(isDuel),
      "shots"                  -> b(isShot),
      "shots_on_target_goal"   -> b(isShot && accurate && goal),
      "shots_on_target_no_goal" -> b(isShot && accurate && !goal),
      "shots_on_target"        -> b(isShot && accurate),
      "fouls"                  -> b(isFoul),
      "own_goals"              -> b(hasTag(102)),
      "free_kicks"             -> b(isFreeKick),
      "effective_free_kicks"   -> b(isFreeKick && accurate),
      "penalties_scored"       -> b(isFreeKick && col("subEventId") === 35 && goal),
      "goals"                  -> b(goal))
  }

  val counterNames: Seq[String] = counterColumns.map(_._1)

  /** Attach the 17 counter columns to an event frame (F4). */
  def withCounters(events: DataFrame): DataFrame =
    counterColumns.foldLeft(events) { case (df, (n, c)) =>
      df.withColumn(n, c)
    }

  /** A1: per-(match, player) counter sums. The reference holds these in
    * `updateStateByKey` with reset-on-match-change; batch-side they are
    * exactly one keyed aggregation — a single shuffle on
    * (matchId, playerId), partial map-side sums included for free. */
  def perMatchCounters(events: DataFrame): DataFrame =
    withCounters(events)
      .groupBy(col("matchId"), col("playerId"))
      .agg(
        sum(col(counterNames.head)).as(counterNames.head),
        counterNames.tail.map(n => sum(col(n)).as(n)): _*)

  /** Guarded ratio: division-by-zero ⇒ 0 (the reference's bare
    * `except`, which the spec's "bound between 0 and 1" implies). */
  def ratio(num: Column, den: Column): Column =
    when(den === 0, 0.0).otherwise(num.cast("double") / den.cast("double"))

  /** A2: per-match final metrics over the summed counters
    * (docs/Specs.pdf pp.4-5 formulas). */
  def finalMetrics(perMatch: DataFrame): DataFrame =
    perMatch.select(
      col("matchId"), col("playerId"),
      ratio(col("accurate_normal_passes") + col("accurate_key_passes") * 2,
        col("normal_passes") + col("key_passes") * 2).as("pass_accuracy"),
      ratio(col("duels_won") + col("neutral_duels") * 0.5,
        col("total_duels")).as("duel_effectiveness"),
      ratio(col("shots_on_target_goal") + col("shots_on_target_no_goal") * 0.5,
        col("shots")).as("shot_effectiveness"),
      col("fouls"), col("own_goals"), col("shots_on_target"),
      ratio(col("effective_free_kicks") + col("penalties_scored"),
        col("free_kicks")).as("free_kick_effectiveness"),
      col("goals"))

  /** Full pipeline: raw events → per-(match,player) final metrics. */
  def playerMatchMetrics(events: DataFrame): DataFrame =
    finalMetrics(perMatchCounters(events))

  /** Per-match player contribution (reference updatePlayerRating
    * master.py:230-232): mean of the 4 performance numbers, then the
    * foul/own-goal penalty. */
  def contribution: Column = {
    val base = (col("pass_accuracy") + col("duel_effectiveness") +
      col("shot_effectiveness") + col("shots_on_target")) / 4
    base - (lit(0.005) * col("fouls") + lit(0.05) * col("own_goals")) * base
  }
}
