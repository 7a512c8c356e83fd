package graft.fpl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FoldsSpec extends SparkSpec {
  import spark.implicits._

  test("profile pass-accuracy chain r₁=x₁, rₙ=(xₙ+rₙ₋₁)/2 (A3)") {
    // matches in order: 0.8, 0.4, 0.6 → r = ((0.8+… ) chain)
    val fm = Seq(
      (1L, 10L, 0.8, 0L, 0L, 0L, 2L),
      (2L, 10L, 0.4, 1L, 0L, 1L, 1L),
      (3L, 10L, 0.6, 0L, 1L, 2L, 0L))
      .toDF("matchId", "playerId", "pass_accuracy", "fouls", "own_goals",
        "shots_on_target", "goals")
    val p = Folds.profiles(fm).collect().head
    val expected = (((0.8 + 0.4) / 2) + 0.6) / 2
    assert(approx(p.getAs[Double]("pass_accuracy"), expected))
    assert(p.getAs[Long]("fouls") == 1L)
    assert(p.getAs[Long]("goals") == 3L)
    assert(p.getAs[Long]("own_goals") == 1L)
    assert(p.getAs[Long]("shots_on_target") == 3L)
    assert(p.getAs[Long]("matches_played") == 3L)
  }

  test("profile chain is order-sensitive (matchId defines order)") {
    val fwd = Seq((1L, 10L, 0.8), (2L, 10L, 0.2), (3L, 10L, 0.6))
    val rev = Seq((1L, 10L, 0.6), (2L, 10L, 0.2), (3L, 10L, 0.8))
    def run(rows: Seq[(Long, Long, Double)]): Double =
      Folds.profiles(rows.toDF("matchId", "playerId", "pass_accuracy")
          .withColumn("fouls", lit(0L)).withColumn("own_goals", lit(0L))
          .withColumn("shots_on_target", lit(0L)).withColumn("goals", lit(0L)))
        .collect().head.getAs[Double]("pass_accuracy")
    assert(approx(run(fwd), 0.55))  // ((0.8→0.2)=0.5 → with 0.6)/2
    assert(approx(run(rev), 0.6))   // ((0.6→0.2)=0.4 → with 0.8)/2
  }

  test("AvgOfAvgs typed Aggregator matches the closed form") {
    val agg = new Folds.AvgOfAvgs().toColumn
    val ds = Seq(Folds.SeqVal(10L, 1L, 0.8), Folds.SeqVal(10L, 2L, 0.4),
      Folds.SeqVal(10L, 3L, 0.6)).toDS()
    val out = ds.groupByKey(_.playerId).agg(agg).collect().head._2
    assert(approx(out, (((0.8 + 0.4) / 2) + 0.6) / 2))
  }

  test("rating trajectory r₀=0.5, r'=factor·(c+r)/2, emits Δ (A4)") {
    val in = Seq(
      Folds.RatingIn(10L, 1L, 1L, 0.6, 1.05),
      Folds.RatingIn(10L, 2L, 2L, 0.4, 30.0 / 90.0)).toDS()
    val pts = Folds.ratingTrajectory(in).collect().sortBy(_.matchId)
    val r1 = 1.05 * (0.6 + 0.5) / 2
    val r2 = (30.0 / 90.0) * (0.4 + r1) / 2
    assert(approx(pts(0).rating, r1) && approx(pts(0).delta, r1 - 0.5))
    assert(approx(pts(1).rating, r2) && approx(pts(1).delta, r2 - r1))
  }

  test("end-to-end ratings over the fixture (metrics ⋈ minutes)") {
    val parsed = Ingest.parse(Fixture.allLines.toDF("value"))
    val fm = MetricsAlgebra.playerMatchMetrics(Ingest.events(parsed))
    val pm = Flatten.playerMinutes(Ingest.matches(parsed))
    val ratings = Folds.ratings(spark, fm, pm).collect()
    // p1: full-match starter → factor 1.05
    val p1 = ratings.find(_.getAs[Long]("playerId") == 1L).get
    // contribution(p1): pass_acc=0.75, others 0 → 0.75/4; no fouls/og
    val c1 = 0.75 / 4
    assert(approx(p1.getAs[Double]("rating"), 1.05 * (c1 + 0.5) / 2))
    // p3 subbed out at 60 → factor 60/90
    val p3 = ratings.find(_.getAs[Long]("playerId") == 3L).get
    val c3raw = (0.0 + 0.0 + 0.5 + 2.0) / 4  // shot_eff 0.5, sot 2
    assert(approx(p3.getAs[Double]("rating"), (60.0 / 90.0) * (c3raw + 0.5) / 2))
    // team ids attached for chemistry
    assert(p3.getAs[Long]("teamId") == 100L)
  }
}
