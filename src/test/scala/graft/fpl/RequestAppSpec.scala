package graft.fpl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden request/response flows (SURVEY §5.2 item 5, FIXTURES.md A5). */
class RequestAppSpec extends SparkSpec {
  import spark.implicits._

  private def roles = Seq("GK") ++ Seq.fill(4)("DF") ++
    Seq.fill(4)("MD") ++ Seq.fill(2)("FW")
  private def playersDim = (0 until 22).map { i =>
    (s"P$i", "X", "1990-01-01", "right", roles(i % 11), 180, "X", 75,
      i.toLong)
  }.toDF("name", "birthArea", "birthDate", "foot", "role", "height",
    "passportArea", "weight", "Id")

  private val emptyChem = Seq.empty[(Long, Long, Double)]
    .toDF("p1", "p2", "chemistry")
  private val emptyRatings = Seq.empty[(Long, Double)]
    .toDF("playerId", "rating")
  private val emptyProfiles = Seq.empty[(Long, Long, Long, Long, Double, Long)]
    .toDF("playerId", "fouls", "goals", "own_goals", "pass_accuracy",
      "shots_on_target")

  private lazy val matches =
    Ingest.matches(Ingest.parse(Fixture.allLines.toDF("value")))

  private def teamJson(key: String, name: String, offset: Int): String =
    s""""$key": {"name": "$name", ${(1 to 11).map(i =>
      s""""player$i": "P${offset + i - 1}"""").mkString(", ")}}"""

  test("req_type 1: win prediction responds with both teams' chances") {
    val req = s"""{"req_type": 1, "date": "2018-05-20",
      ${teamJson("team1", "Alpha", 0)}, ${teamJson("team2", "Beta", 11)}}"""
    val (file, out) = RequestApp.handle(spark, req, playersDim,
      Seq(("Alpha FC", 100L)).toDF("name", "Id"), emptyChem,
      emptyRatings, emptyProfiles, matches)
    assert(file == "predict_result.json")
    val row = out.collect().head
    val t1 = row.getStruct(row.fieldIndex("team1"))
    assert(t1.getAs[String]("name") == "Alpha")
    assert(approx(t1.getAs[Double]("winning chance"), 50.0))
  }

  test("req_type 1: invalid squad → {status: Invalid Team}") {
    // two GKs: P0 and P11 both GK role (roles repeat per 11)
    val badTeam = s""""team1": {"name": "Bad", ${(1 to 10).map(i =>
      s""""player$i": "P${i - 1}"""").mkString(", ")}, "player11": "P11"}"""
    val req = s"""{"req_type": 1, "date": "2018-05-20", $badTeam,
      ${teamJson("team2", "Beta", 11)}}"""
    val (_, out) = RequestApp.handle(spark, req, playersDim,
      Seq(("Alpha FC", 100L)).toDF("name", "Id"), emptyChem,
      emptyRatings, emptyProfiles, matches)
    assert(out.columns.toSeq == Seq("status"))
    assert(out.as[String].head() == "Invalid Team")
  }

  test("req_type 2: player profile response") {
    val req = """{"req_type": 2, "name": "P3"}"""
    val (file, out) = RequestApp.handle(spark, req, playersDim,
      Seq(("Alpha FC", 100L)).toDF("name", "Id"), emptyChem,
      emptyRatings, emptyProfiles, matches)
    assert(file == "player_result.json")
    val r = out.collect().head
    assert(r.getAs[String]("role") == "DF")
    assert(r.getAs[Long]("fouls") == 0L)
  }

  test("req_type absent defaults to 3: match info; unknown → Not Found") {
    val players = Ingest.players(spark, tmp("p.csv", Fixture.playersCsv))
    val teams = Ingest.teams(spark, tmp("t.csv", Fixture.teamsCsv))
    val req = """{"date": "2018-05-20", "label": "Alpha FC - Beta FC, 2 - 1"}"""
    val (file, out) = RequestApp.handle(spark, req, players, teams,
      emptyChem, emptyRatings, emptyProfiles, matches)
    assert(file == "match_details.json")
    assert(out.collect().head.getAs[String]("winner") == "Alpha FC")

    val miss = """{"date": "2019-01-01", "label": "nope"}"""
    val (_, notFound) = RequestApp.handle(spark, miss, players, teams,
      emptyChem, emptyRatings, emptyProfiles, matches)
    assert(notFound.as[String].head() == "Not Found")
  }

  private def tmp(name: String, content: String): String = {
    val p = java.nio.file.Files.createTempDirectory("graft").resolve(name)
    java.nio.file.Files.writeString(p, content)
    p.toString
  }
}
