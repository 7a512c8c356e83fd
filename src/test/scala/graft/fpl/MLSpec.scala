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

  test("winPredictionFull: fallback ratings + age model + retired rule (§2.8)") {
    import org.apache.spark.sql.functions._
    val roles = Seq("GK") ++ Seq.fill(4)("DF") ++ Seq.fill(4)("MD") ++
      Seq.fill(2)("FW")
    def team(offset: Int, birthYear: Int) = (0 until 11).map { i =>
      (s"Q${offset + i}", roles(i), (offset + i).toLong,
        java.sql.Date.valueOf(s"$birthYear-01-01"))
    }
    val squadA = team(100, 1995)   // ~23 at request date → prime
    val playersDim = (squadA ++ team(200, 1995))
      .toDF("name", "role", "Id", "birthDate")
    val profiles = playersDim.select($"Id".as("playerId"))
      .withColumn("fouls", lit(0L)).withColumn("goals", lit(1L))
      .withColumn("own_goals", lit(0L))
      .withColumn("pass_accuracy", lit(0.7))
      .withColumn("shots_on_target", lit(2L))
      .withColumn("matches_played", lit(10L))
    val ratings = playersDim.select($"Id".as("playerId"))
      .withColumn("rating", lit(0.6))
    // training curve peaks at age 23, drops below 0.2 past ~35
    val hist = (17 to 40).map(a =>
      (a.toDouble, math.max(0.05, 0.8 - math.pow((a - 23.0) / 8, 2))))
      .toDF("age", "rating")
    val t1 = Serving.TeamRequest("QA", squadA.map(_._1))
    val t2 = Serving.TeamRequest("QB", team(200, 1995).map(_._1))
    val ok = Serving.winPredictionFull(spark, playersDim,
      Seq.empty[(Long, Long, Double)].toDF("p1", "p2", "chemistry"),
      ratings, profiles, hist, t1, t2, "2018-05-20")
    assert(ok.isRight)
    assert(approx(ok.toOption.get.map(_.winningChance).sum, 100.0))

    // same squads but born 1975 → age 43 → predicted < 0.2 → retired
    val oldDim = playersDim.withColumn("birthDate",
      lit(java.sql.Date.valueOf("1975-01-01")))
    val rej = Serving.winPredictionFull(spark, oldDim,
      Seq.empty[(Long, Long, Double)].toDF("p1", "p2", "chemistry"),
      ratings, profiles, hist, t1, t2, "2018-05-20")
    assert(rej.isLeft)
    assert(rej.left.toOption.get("retired").nonEmpty)
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
