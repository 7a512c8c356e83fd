package graft.fpl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MLSpec extends SparkSpec {
  import spark.implicits._

  private def mkProfiles(n: Int) = (1 to n).map { i =>
    val heavy = i % 2 == 0
    (i.toLong,
      if (heavy) 10L + i % 3 else 0L,       // fouls
      if (heavy) 8L + i % 2 else 0L,        // goals
      0L,
      if (heavy) 0.9 else 0.1,              // pass_accuracy
      if (heavy) 12L else 1L,               // shots_on_target
      if (i <= 4) 2L else 10L)              // matches_played (sparse first 4)
    }.toDF("playerId", "fouls", "goals", "own_goals", "pass_accuracy",
      "shots_on_target", "matches_played")

  test("KMeans(k) separates distinct profile shapes (§2.8)") {
    val clusters = MLCapabilities.clusterProfiles(mkProfiles(40), k = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val heavyClusters = clusters.filter(_._1 % 2 == 0).values.toSet
    val lightClusters = clusters.filter(_._1 % 2 == 1).values.toSet
    assert(heavyClusters.size == 1 && lightClusters.size == 1)
    assert(heavyClusters != lightClusters)
  }

  test("fallback rating: sparse players get their cluster's mean rating") {
    val profiles = mkProfiles(40)
    val ratings = (1 to 40).map(i => (i.toLong,
      if (i % 2 == 0) 0.8 else 0.3)).toDF("playerId", "rating")
    val out = MLCapabilities.fallbackRatings(profiles, ratings,
      minMatches = 5L, k = 2).collect()
      .map(r => r.getAs[Long]("playerId") ->
        r.getAs[Double]("effective_rating")).toMap
    // player 2 is sparse (2 matches) and heavy-profile → cluster mean 0.8
    assert(approx(out(2L), 0.8))
    // player 3 is sparse and light-profile → cluster mean 0.3
    assert(approx(out(3L), 0.3))
    // player 6 is dense → keeps its own rating
    assert(approx(out(6L), 0.8))
  }

  test("quadratic rating-vs-age fits a parabola; retired rule at 0.2") {
    // rating = 1 - ((age-27)/10)^2 peaks at 27
    val train = (17 to 37).map { a =>
      (a.toDouble, 1.0 - math.pow((a - 27.0) / 10.0, 2)) }
      .toDF("age", "rating")
    val score = MLCapabilities.ratingVsAge(train)
    val preds = score((17 to 45).map(_.toDouble).toDF("age"))
      .collect().map(r => r.getAs[Double]("age") ->
        ((r.getAs[Double]("predicted_rating"), r.getAs[Boolean]("retired"))))
      .toMap
    assert(math.abs(preds(27.0)._1 - 1.0) < 0.05)
    assert(preds(27.0)._1 > preds(20.0)._1)
    assert(preds(27.0)._1 > preds(37.0)._1)
    assert(preds(45.0)._2, "45-year-old must be flagged retired (<0.2)")
    assert(!preds(27.0)._2)
  }
}
