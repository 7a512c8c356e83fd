package graft.fpl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ServingSpec extends SparkSpec {
  import spark.implicits._

  // 22 players forming two valid squads: 1 GK, 4 DF, 4 MD, 2 FW each
  private def mkPlayers(teamOffset: Int): Seq[(String, String, Long)] = {
    val roles = Seq("GK") ++ Seq.fill(4)("DF") ++ Seq.fill(4)("MD") ++
      Seq.fill(2)("FW")
    roles.zipWithIndex.map { case (r, i) =>
      (s"P${teamOffset + i}", r, (teamOffset + i).toLong)
    }
  }
  private val squadA = mkPlayers(100)
  private val squadB = mkPlayers(200)

  lazy val playersDim = (squadA ++ squadB)
    .map { case (n, r, id) => (n, "X", "1990-01-01", "right", r, 180, "X", 75, id) }
    .toDF("name", "birthArea", "birthDate", "foot", "role", "height",
      "passportArea", "weight", "Id")

  private val req1 = Serving.TeamRequest("Alpha", squadA.map(_._1))
  private val req2 = Serving.TeamRequest("Beta", squadB.map(_._1))

  test("win prediction: neutral inputs → 50/50, chances sum to 100") {
    // no chemistry/rating tables → defaults 0.5 everywhere, equal strength
    val emptyChem = Seq.empty[(Long, Long, Double)]
      .toDF("p1", "p2", "chemistry")
    val emptyRat = Seq.empty[(Long, Double)].toDF("playerId", "rating")
    val Some(res) = Serving.winPrediction(spark, playersDim, emptyChem,
      emptyRat, req1, req2)
    assert(approx(res(0).winningChance, 50.0))
    assert(approx(res.map(_.winningChance).sum, 100.0))
  }

  test("win prediction: stronger team gets >50") {
    val chem = squadA.flatMap(a => squadA.filter(_ != a)
        .map(b => (a._3, b._3, 0.9))) ++
      squadB.flatMap(a => squadB.filter(_ != a).map(b => (a._3, b._3, 0.3)))
    val rat = (squadA.map(p => (p._3, 0.9)) ++ squadB.map(p => (p._3, 0.3)))
      .toDF("playerId", "rating")
    val Some(res) = Serving.winPrediction(spark, playersDim,
      chem.toDF("p1", "p2", "chemistry"), rat, req1, req2)
    assert(res(0).winningChance > 50.0)
    assert(approx(res.map(_.winningChance).sum, 100.0))
    // exact spec math: sA = mean(0.9·0.9), sB = mean(0.3·0.3)
    val sA = 0.9 * 0.9; val sB = 0.3 * 0.3
    assert(approx(res(0).winningChance, (0.5 + sA - (sA + sB) / 2) * 100))
  }

  test("win prediction: role validation rejects (spec Q5: GK=1 DF≥3 MD≥2 FW≥1)") {
    // swap the GK of team A for an extra DF → invalid
    val badSquad = req1.copy(players = req1.players.tail :+ squadB(1)._1)
    val emptyChem = Seq.empty[(Long, Long, Double)]
      .toDF("p1", "p2", "chemistry")
    val emptyRat = Seq.empty[(Long, Double)].toDF("playerId", "rating")
    assert(Serving.winPrediction(spark, playersDim, emptyChem, emptyRat,
      badSquad, req2).isEmpty)
  }

  test("player profile join (r_type 2)") {
    val profiles = Seq((100L, 3L, 2L, 1L, 0.77, 5L, 2L))
      .toDF("playerId", "fouls", "goals", "own_goals", "pass_accuracy",
        "shots_on_target", "matches_played")
    val out = Serving.playerProfile(playersDim, profiles, "P100")
      .collect().head
    assert(out.getAs[String]("role") == "GK")
    assert(out.getAs[Long]("fouls") == 3L)
    assert(approx(out.getAs[Double]("pass_accuracy"), 0.77))
    // unknown player → no row; known player without profile → zeros
    val out2 = Serving.playerProfile(playersDim, profiles, "P101")
      .collect().head
    assert(out2.getAs[Long]("fouls") == 0L)
  }

  test("match info (r_type 3): winner name, real cards, scorers") {
    val parsed = Ingest.parse(Fixture.allLines.toDF("value"))
    val matches = Ingest.matches(parsed)
    val players = Ingest.players(spark, writeTmp("players.csv", Fixture.playersCsv))
    val teams = Ingest.teams(spark, writeTmp("teams.csv", Fixture.teamsCsv))
    val out = Serving.matchInfo(matches, players, teams,
      "2018-05-20", "Alpha FC - Beta FC, 2 - 1").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("winner") == "Alpha FC")
    assert(r.getAs[String]("venue") == "Stadio Alpha")
    def arr(c: String): Seq[String] = r.getSeq[String](r.fieldIndex(c)).toList
    assert(arr("goals").sorted == Seq("Cara", "Lou"))
    assert(arr("own_goals") == Seq("Kim"))
    assert(arr("yellow_cards") == Seq("Bob"))
    assert(arr("red_cards") == Seq("Lou"))
    // unknown match → empty
    assert(Serving.matchInfo(matches, players, teams,
      "2018-05-21", "nope").isEmpty)
  }

  private def writeTmp(name: String, content: String): String = {
    val p = java.nio.file.Files.createTempDirectory("graft").resolve(name)
    java.nio.file.Files.writeString(p, content)
    p.toString
  }
}
