package graft.fpl

import graft.SparkSpec

class FlattenSpec extends SparkSpec {
  import spark.implicits._

  lazy val matches =
    Ingest.matches(Ingest.parse(Fixture.allLines.toDF("value"))).cache()

  test("playerTeam explodes lineup ∪ bench with team ids (G2)") {
    val pt = Flatten.playerTeam(matches).collect()
      .map(r => (r.getAs[Long]("playerId"), r.getAs[Long]("teamId"))).toSet
    assert(pt == Set((1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L),
      (5L, 100L), (11L, 200L), (12L, 200L), (13L, 200L), (14L, 200L)))
  }

  test("playerMinutes interval logic (G1)") {
    val pm = Flatten.playerMinutes(matches).collect()
      .map(r => r.getAs[Long]("playerId") ->
        ((r.getAs[Int]("inMinute"), r.getAs[Int]("outMinute"),
          r.getAs[Int]("minutesPlayed"), r.getAs[Boolean]("neverSubstituted"))))
      .toMap
    assert(pm(1L) == ((0, 90, 90, true)))    // full-match starter
    assert(pm(3L) == ((0, 60, 60, false)))   // subbed out at 60
    assert(pm(4L) == ((60, 90, 30, false)))  // subbed in at 60
    assert(pm(5L) == ((-1, -1, 0, false)))   // unused bench
    assert(pm(14L) == ((-1, -1, 0, false)))  // unused bench (away)
  }

  test("starter subbed out at exactly minute 90 is NOT neverSubstituted") {
    val pm = Flatten.playerMinutes(
      Ingest.matches(Ingest.parse(Seq(Fixture.minute90MatchJson)
        .toDF("value"))))
      .collect()
      .map(r => r.getAs[Long]("playerId") ->
        ((r.getAs[Int]("inMinute"), r.getAs[Int]("outMinute"),
          r.getAs[Int]("minutesPlayed"), r.getAs[Boolean]("neverSubstituted"))))
      .toMap
    // full 90 minutes played, but present in the substitution list ⇒
    // no "never substituted" bonus (spec §1c) — outMinute alone cannot
    // decide this
    assert(pm(21L) == ((0, 90, 90, false)))
    assert(pm(22L) == ((0, 90, 90, true)))   // untouched starter
    assert(pm(23L) == ((90, 90, 0, false)))  // subbed in at 90: 0 minutes
  }

  test("matchSquadStats uses real card/goal counters (G3, spec Q4)") {
    val st = Flatten.matchSquadStats(matches).collect()
      .map(r => r.getAs[Long]("playerId") ->
        ((r.getAs[Int]("goals"), r.getAs[Int]("ownGoals"),
          r.getAs[Int]("yellowCards"), r.getAs[Int]("redCards"))))
      .toMap
    assert(st(3L) == ((1, 0, 0, 0)))
    assert(st(2L) == ((0, 0, 1, 0)))
    assert(st(11L) == ((0, 1, 0, 0)))
    assert(st(12L) == ((1, 0, 0, 1)))
    assert(st(14L) == ((0, 0, 0, 0)))
  }
}
