package graft.fpl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Request serving (reference ui.py, E3) — each request type is ONE
  * Catalyst plan over the persisted tables, replacing the reference's
  * per-player `filter().first()` driver loops (~44 Spark jobs per win
  * prediction, ui.py:40-42) with broadcast hash joins (one job).
  */
object Serving {

  /** Squad validation thresholds (spec p.8: GK=1, DF≥3, MD≥2, FW≥1;
    * SURVEY §2.9 Q5 keeps them configurable). */
  case class RoleRules(gk: Int = 1, dfMin: Int = 3, mdMin: Int = 2,
      fwMin: Int = 1)

  /** One side of a win-prediction request. */
  case class TeamRequest(name: String, players: Seq[String])

  case class TeamChance(team: String, winningChance: Double)

  /** r_type 1 — win prediction (ui.py:27-76; docs/Specs.pdf pp.7-8).
    *
    * strength(p) = mean(chemistry(p, 10 teammates)) · rating(p)
    * strength(team) = mean over 11 players
    * chance(A) = (0.5 + sA − (sA+sB)/2) · 100
    *
    * Returns None if either squad fails role validation ("Invalid
    * Team"). players/chemistry/ratings are broadcast-sized dims. */
  def winPrediction(
      spark: SparkSession,
      players: DataFrame,           // name, role, Id
      chemistrySym: DataFrame,      // p1, p2, chemistry (symmetric)
      ratings: DataFrame,           // playerId, rating
      team1: TeamRequest, team2: TeamRequest,
      rules: RoleRules = RoleRules()): Option[Seq[TeamChance]] = {
    import spark.implicits._

    val req = (team1.players.map((team1.name, _)) ++
      team2.players.map((team2.name, _))).toDF("team", "name")
    val squad = req.join(broadcast(players), Seq("name"), "inner")
      .select($"team", $"name", $"Id".as("playerId"), $"role")
      .cache()
    try {
      val roleCounts = squad.groupBy($"team").agg(
        sum(when($"role" === "GK", 1).otherwise(0)).as("gk"),
        sum(when($"role" === "DF", 1).otherwise(0)).as("df"),
        sum(when($"role" === "MD", 1).otherwise(0)).as("md"),
        sum(when($"role" === "FW", 1).otherwise(0)).as("fw"),
        count(lit(1)).as("n")).collect()
      val valid = roleCounts.length == 2 && roleCounts.forall { r =>
        r.getAs[Long]("gk") == rules.gk &&
        r.getAs[Long]("df") >= rules.dfMin &&
        r.getAs[Long]("md") >= rules.mdMin &&
        r.getAs[Long]("fw") >= rules.fwMin &&
        r.getAs[Long]("n") == 11
      }
      if (!valid) None
      else {
        val a = squad.select($"team", $"playerId")
        val b = squad.select($"team".as("team2"), $"playerId".as("mate"))
        val pairChem = a
          .join(b, $"team" === $"team2" && $"playerId" =!= $"mate")
          .join(broadcast(chemistrySym),
            $"playerId" === $"p1" && $"mate" === $"p2", "left_outer")
          .na.fill(0.5, Seq("chemistry"))  // unseen pair keeps init 0.5
        val strength = pairChem
          .groupBy($"team", $"playerId")
          .agg(avg($"chemistry").as("meanChem"))
          .join(broadcast(ratings), Seq("playerId"), "left_outer")
          .na.fill(0.5, Seq("rating"))     // unrated keeps init 0.5
          .groupBy($"team")
          .agg(avg($"meanChem" * $"rating").as("strength"))
          .collect().map(r =>
            r.getAs[String]("team") -> r.getAs[Double]("strength")).toMap
        val s1 = strength.getOrElse(team1.name, 0.0)
        val s2 = strength.getOrElse(team2.name, 0.0)
        val c1 = (0.5 + s1 - (s1 + s2) / 2) * 100
        Some(Seq(TeamChance(team1.name, c1),
          TeamChance(team2.name, 100 - c1)))
      }
    } finally squad.unpersist()
  }

  /** Full spec flow for win prediction (docs/Specs.pdf pp.7-8, SURVEY
    * §2.8): effective ratings come from the cluster fallback for
    * sparse players (< minMatches), then the quadratic rating-vs-age
    * model predicts each player's rating at the request date; any
    * squad member predicted below 0.2 is "retired" and the request is
    * rejected with the retired names. */
  def winPredictionFull(
      spark: SparkSession,
      players: DataFrame,           // name, role, Id, birthDate
      chemistrySym: DataFrame,
      ratings: DataFrame,           // playerId, rating (last snapshot)
      profiles: DataFrame,          // Folds.profiles output
      ratingHistory: DataFrame,     // playerId, rating + age training rows
      team1: TeamRequest, team2: TeamRequest, date: String,
      rules: RoleRules = RoleRules(), minMatches: Long = 5L)
      : Either[Map[String, Seq[String]], Seq[TeamChance]] = {
    import spark.implicits._
    val effective = MLCapabilities.fallbackRatings(profiles, ratings,
      minMatches)
      .select($"playerId", $"effective_rating".as("rating"))
    val scorer = MLCapabilities.ratingVsAge(ratingHistory)
    val reqNames = (team1.players ++ team2.players).toDF("name")
    val squadAges = reqNames.join(broadcast(players), Seq("name"))
      .select($"name", $"Id".as("playerId"),
        MLCapabilities.ageAt($"birthDate", to_date(lit(date))).as("age"))
    val predicted = scorer(squadAges)
    val retired = predicted.filter($"retired")
      .select($"name").as[String].collect().toSeq
    if (retired.nonEmpty) Left(Map("retired" -> retired))
    else winPrediction(spark, players, chemistrySym, effective,
      team1, team2, rules) match {
      case None => Left(Map("invalid" -> Seq("Invalid Team")))
      case Some(chances) => Right(chances)
    }
  }

  /** r_type 2 — player profile (ui.py:77-107): background from the dim ⋈
    * cumulative profile metrics. */
  def playerProfile(players: DataFrame, profiles: DataFrame,
      name: String): DataFrame =
    players.filter(col("name") === name)
      .join(profiles, players("Id") === profiles("playerId"), "left_outer")
      .select(players("name"), col("birthArea"), col("birthDate"),
        col("foot"), col("role"), col("height"), col("passportArea"),
        col("weight"),
        coalesce(col("fouls"), lit(0L)).as("fouls"),
        coalesce(col("goals"), lit(0L)).as("goals"),
        coalesce(col("own_goals"), lit(0L)).as("own_goals"),
        coalesce(col("pass_accuracy"), lit(0.0)).as("pass_accuracy"),
        coalesce(col("shots_on_target"), lit(0L)).as("shots_on_target"))

  /** r_type 3 — match info (ui.py:109-191): date+label lookup, squad
    * flatten with REAL card counts (spec Q4), names via broadcast dims. */
  def matchInfo(matches: DataFrame, players: DataFrame, teams: DataFrame,
      date: String, label: String): DataFrame = {
    val m = matches.filter(
      split(col("dateutc"), " ").getItem(0) === date &&
        col("label") === label)
    val stats = Flatten.matchSquadStats(m)
      .join(broadcast(players.select(col("Id"), col("name"))),
        col("playerId") === col("Id"), "inner")
      .drop("Id")
    val winners = m.select(col("wyId").as("matchId"), col("winner"),
      col("duration"), col("venue"), col("gameweek"), col("dateutc"))
      .join(broadcast(teams.select(col("Id"), col("name").as("winnerName"))),
        col("winner") === col("Id"), "left_outer")
      .drop("Id")
    stats.groupBy(col("matchId")).agg(
        flatten(collect_list(when(col("goals") > 0,
          array_repeat(col("name"), col("goals"))).otherwise(array()
            .cast("array<string>")))).as("goals"),
        flatten(collect_list(when(col("ownGoals") > 0,
          array_repeat(col("name"), col("ownGoals"))).otherwise(array()
            .cast("array<string>")))).as("own_goals"),
        collect_list(when(col("yellowCards") > 0, col("name"))).as("yellow_cards"),
        collect_list(when(col("redCards") > 0, col("name"))).as("red_cards"))
      .join(winners, Seq("matchId"), "inner")
      .select(
        split(col("dateutc"), " ").getItem(0).as("date"),
        col("duration"),
        coalesce(col("winnerName"), lit("draw")).as("winner"),
        col("venue"), col("gameweek"),
        sort_array(col("goals")).as("goals"),
        sort_array(col("own_goals")).as("own_goals"),
        sort_array(col("yellow_cards")).as("yellow_cards"),
        sort_array(col("red_cards")).as("red_cards"))
  }
}
