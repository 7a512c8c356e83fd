package graft.fpl

import graft.SparkSpec
import org.apache.spark.sql.Row

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  lazy val parsed = Ingest.parse(Fixture.allLines.toDF("value"))
  lazy val events = Ingest.events(parsed).cache()
  lazy val matches = Ingest.matches(parsed).cache()

  def metricsFor(pid: Long): Row =
    MetricsAlgebra.playerMatchMetrics(events)
      .filter($"playerId" === pid).collect().head

  test("record-type split (F1/F2)") {
    assert(matches.count() == 1)
    assert(events.count() == Fixture.eventJsons.size)
    assert(matches.select("wyId").as[Long].head() == 1001L)
  }

  test("pass metrics: accurate/key algebra (p1)") {
    val m = metricsFor(1)
    // p1: anp=1, akp=1, np=2, kp=1 → (1 + 2·1)/(2 + 2·1) = 0.75
    assert(approx(m.getAs[Double]("pass_accuracy"), 0.75))
  }

  test("duel effectiveness (p2: won+neutral, p11: lost)") {
    // p2: (1 + 0.5·1)/2 = 0.75
    assert(approx(metricsFor(2).getAs[Double]("duel_effectiveness"), 0.75))
    // p2 pass accuracy: inaccurate key pass only → 0/(0+2) = 0
    assert(approx(metricsFor(2).getAs[Double]("pass_accuracy"), 0.0))
    // p11: lost duel → 0/1 = 0
    assert(approx(metricsFor(11).getAs[Double]("duel_effectiveness"), 0.0))
  }

  test("shot effectiveness (p3)") {
    // p3: (1 + 0.5·1)/3 = 0.5; shots_on_target = 2
    val m = metricsFor(3)
    assert(approx(m.getAs[Double]("shot_effectiveness"), 0.5))
    assert(m.getAs[Long]("shots_on_target") == 2L)
    assert(m.getAs[Long]("goals") == 1L)
  }

  test("free kicks + penalty (p12)") {
    // p12: fk=2, efk=2, pen=1 → (2+1)/2 = 1.5
    val m = metricsFor(12)
    assert(approx(m.getAs[Double]("free_kick_effectiveness"), 1.5))
    assert(m.getAs[Long]("goals") == 1L)
  }

  test("fouls (p13) and div-zero guards") {
    val m = metricsFor(13)
    assert(m.getAs[Long]("fouls") == 1L)
    // no passes/duels/shots/fks → all ratios guarded to 0
    assert(m.getAs[Double]("pass_accuracy") == 0.0)
    assert(m.getAs[Double]("duel_effectiveness") == 0.0)
    assert(m.getAs[Double]("shot_effectiveness") == 0.0)
    assert(m.getAs[Double]("free_kick_effectiveness") == 0.0)
  }

  test("own goal counts on ANY event type (spec Q1, not the 19-tuple bug)") {
    assert(metricsFor(11).getAs[Long]("own_goals") == 1L)
  }

  test("metric bounds: pass/duel accuracy ∈ [0,1] on fixture") {
    val rows = MetricsAlgebra.playerMatchMetrics(events).collect()
    rows.foreach { r =>
      val pa = r.getAs[Double]("pass_accuracy")
      val de = r.getAs[Double]("duel_effectiveness")
      assert(pa >= 0.0 && pa <= 1.0)
      assert(de >= 0.0 && de <= 1.0)
    }
  }
}
