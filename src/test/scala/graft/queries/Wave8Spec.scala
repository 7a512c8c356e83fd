package graft.queries

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantics pins for the round-8 session-2 wave: forward as-of,
  * exact correlation, sliding distinct, Pareto frontier, purged time
  * split, and hard-negative mining. Each test asserts a property the
  * oracle hash cannot see on its own (invariants, certificates,
  * cross-query consistency) at the smallest scale factor. */
class Wave8Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = Registry.queryMap(name)(spark, sf)

  test("corr_matrix_exact: 6 pairs, |corr| ≤ 1, n = row count") {
    val rows = q("corr_matrix_exact").collect()
    assert(rows.length == 6)
    val n = spark.read.parquet(s"$sf/lineitem.parquet").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == n)
      val c = r.getAs[Double]("corr")
      assert(math.abs(c) <= 1.0 + 1e-12, s"corr out of range: $c")
    }
    // pair list is the canonical upper triangle of the 4 measures
    val pairs = rows.map(r => (r.getAs[String]("var_x"),
      r.getAs[String]("var_y"))).toSet
    assert(pairs.size == 6 && !pairs.exists { case (x, y) => x == y })
  }

  test("corr_matrix_exact: a duplicated measure correlates exactly 1") {
    // perfect linear dependence must survive the integer-moment path
    val df = Seq((1L, 2L), (2L, 4L), (5L, 10L), (7L, 14L)).toDF("x", "y")
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val m = df.agg(count(lit(1)).as("n"), sum(dec($"x")).as("sx"),
      sum(dec($"y")).as("sy"), sum(dec($"x") * dec($"x")).as("sxx"),
      sum(dec($"y") * dec($"y")).as("syy"),
      sum(dec($"x") * dec($"y")).as("sxy")).head()
    val n = BigDecimal(m.getAs[Long]("n"))
    val (sx, sy) = (m.getAs[java.math.BigDecimal]("sx"),
      m.getAs[java.math.BigDecimal]("sy"))
    val num = (n * BigDecimal(m.getAs[java.math.BigDecimal]("sxy"))
      - BigDecimal(sx) * BigDecimal(sy)).toDouble
    val den = math.sqrt((n * BigDecimal(m.getAs[java.math.BigDecimal]("sxx"))
        - BigDecimal(sx) * BigDecimal(sx)).toDouble) *
      math.sqrt((n * BigDecimal(m.getAs[java.math.BigDecimal]("syy"))
        - BigDecimal(sy) * BigDecimal(sy)).toDouble)
    assert(approx(num / den, 1.0, 1e-15))
  }

  test("window_distinct_users: 7-day distinct bounded by dailies") {
    val rows = q("window_distinct_users").collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("n_users_day"),
        r.getAs[Long]("n_users_7d"))).sortBy(_._1)
    assert(rows.nonEmpty)
    val daily = rows.map(r => r._1 -> r._2).toMap
    rows.foreach { case (day, d, w) =>
      // window ≥ its own day, and ≤ sum of the 7 member days (dedup
      // can only shrink the union, never grow it)
      assert(w >= d, s"day $day: 7d $w < daily $d")
      val ub = (day - 6 to day).map(daily.getOrElse(_, 0L)).sum
      assert(w <= ub, s"day $day: 7d $w > member-day sum $ub")
    }
  }

  test("pareto_frontier: certificate is zero and the frontier is a " +
      "strictly monotone tradeoff") {
    val rows = q("pareto_frontier").collect()
      .map(r => (r.getAs[Long]("size"), r.getAs[Long]("cents"),
        r.getAs[Long]("dominated_in_frontier"))).sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, cert) => assert(cert == 0L) }
    // increasing size must come with strictly increasing price — or a
    // cheaper same-or-larger point would dominate
    rows.sliding(2).foreach {
      case Array((s1, c1, _), (s2, c2, _)) =>
        assert(s1 < s2 && c1 < c2, s"non-monotone: ($s1,$c1) ($s2,$c2)")
      case _ =>
    }
  }

  test("split_time_embargo: partition of the stream; terminal edges " +
      "are exempt") {
    val rows = q("split_time_embargo").collect()
      .map(r => (r.getAs[Long]("fold"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_embargo_head"), r.getAs[Long]("n_embargo_tail")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    val total = spark.read.parquet(s"$sf/events.parquet").count()
    assert(rows.map(_._2).sum == total) // folds partition every row
    val byFold = rows.map(r => r._1 -> r).toMap
    assert(byFold(0L)._3 == 0L, "fold 0 has no previous fold to leak from")
    assert(byFold(4L)._4 == 0L, "fold 4 has no next fold to leak into")
    rows.foreach { case (f, n, h, t) =>
      assert(h + t <= n, s"fold $f: embargo bands exceed the fold") }
  }

  test("hard_negatives: every negative has a different label and " +
      "anchors cap at 2") {
    val out = q("hard_negatives")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"label")
    val joined = out
      .join(emb.select($"vec_id".as("anchor"), $"label".as("la")), "anchor")
      .join(emb.select($"vec_id".as("neg"), $"label".as("ln")), "neg")
    assert(joined.filter($"la" === $"ln").count() == 0,
      "a negative shares its anchor's label")
    val over = out.groupBy($"anchor").count().filter($"count" > 2)
    assert(over.count() == 0, "an anchor got more than K=2 negatives")
    assert(out.filter($"rk" < 1 || $"rk" > 2).count() == 0)
  }

  test("ivm_join_refresh: the maintained join view is a positive-count " +
      "partition of the signed multiset") {
    val rows = q("ivm_join_refresh").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") > 0L, "zero-count group left the view")
    }
    // net count must equal the signed multiset evaluated directly
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumn("rid", $"l_orderkey" * 8L + $"l_linenumber")
    val base = li.filter($"rid" % 5 =!= 4L).count()
    val ins = li.filter($"rid" % 5 === 4L).count()
    val ret = li.filter($"rid" % 5 =!= 4L &&
      ($"rid" % 7 === 3L || $"rid" % 7 === 5L)).count()
    assert(rows.map(_.getAs[Long]("n")).sum == base + ins - ret)
  }

  test("graph_jaccard: similarity is bounded and consistent with " +
      "degrees") {
    val rows = q("graph_jaccard").collect()
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("a"), r.getAs[Long]("b"))
      val (sh, da, db) = (r.getAs[Long]("shared"),
        r.getAs[Long]("deg_a"), r.getAs[Long]("deg_b"))
      val j = r.getAs[Double]("jac")
      assert(a < b)
      assert(sh <= math.min(da, db), s"shared $sh > min degree")
      assert(j >= 0.5 && j <= 1.0)
      assert(approx(j, math.round(sh.toDouble / (da + db - sh) * 1e6)
        / 1e6, 1e-12))
    }
  }

  test("retention_cohorts: k = 0 is the cohort itself (retention 1.0)") {
    val rows = q("retention_cohorts").collect()
    assert(rows.nonEmpty)
    val k0 = rows.filter(_.getAs[Long]("k") == 0L)
    assert(k0.nonEmpty, "every cohort must have its own k=0 row")
    k0.foreach { r =>
      assert(r.getAs[Long]("n_active") == r.getAs[Long]("cohort_size"),
        "k=0 active set must equal the cohort")
      assert(r.getAs[Double]("retention") == 1.0)
    }
    // retention can never exceed 1 and actives never exceed the cohort
    rows.foreach { r =>
      assert(r.getAs[Long]("n_active") <= r.getAs[Long]("cohort_size"))
    }
  }

  test("event_transitions: each row's probability is n/n_from and " +
      "out-probabilities sum to 1 per source type") {
    val rows = q("event_transitions").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("from_type")).foreach {
      case (_, rs) =>
        val nFrom = rs.head.getAs[Long]("n_from")
        assert(rs.forall(_.getAs[Long]("n_from") == nFrom))
        assert(rs.map(_.getAs[Long]("n")).sum == nFrom,
          "pair counts must partition the out-degree total")
        val pSum = rs.map(_.getAs[Double]("p")).sum
        assert(approx(pSum, 1.0, 1e-4), s"p-sum $pSum")
    }
  }

  test("resample_interp: interpolated values stay inside their " +
      "bracket; observed rows are exact") {
    val rows = q("resample_interp").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("h"),
        r.getAs[Double]("v"), r.getAs[Boolean]("is_observed")))
      .groupBy(_._1)
    rows.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      // grid is contiguous and endpoints are observed
      assert(sorted.head._4 && sorted.last._4, "endpoints must be observed")
      assert(sorted.map(_._2).distinct.length == sorted.length)
      val obsIdx = sorted.zipWithIndex.filter(_._1._4).map(_._2)
      obsIdx.sliding(2).filter(_.length == 2).foreach { pair =>
        val (i, j) = (pair(0), pair(1))
        val (lo, hi) = (math.min(sorted(i)._3, sorted(j)._3),
          math.max(sorted(i)._3, sorted(j)._3))
        (i + 1 until j).foreach { m =>
          assert(sorted(m)._3 >= lo - 1e-9 && sorted(m)._3 <= hi + 1e-9,
            s"interpolated value escaped its bracket at index $m")
        }
      }
    }
  }

  test("agg_mode: the mode's count is the group's max value-count") {
    val rows = q("agg_mode").collect()
    assert(rows.nonEmpty)
    val counts = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_returnflag", $"l_quantity".cast("long").as("qty"))
      .groupBy($"l_returnflag", $"qty").count()
      .collect()
      .groupBy(_.getAs[String]("l_returnflag"))
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val byQty = counts(flag).map(x =>
        x.getAs[Long]("qty") -> x.getAs[Long]("count")).toMap
      val maxN = byQty.values.max
      assert(r.getAs[Long]("n_mode") == maxN)
      assert(byQty(r.getAs[Long]("mode_qty")) == maxN)
      // tie-break: smallest qty among the max-count values
      val winners = byQty.filter(_._2 == maxN).keys
      assert(r.getAs[Long]("mode_qty") == winners.min)
    }
  }

  test("asof_forward and asof_attribution cover disjoint regimes of " +
      "the same purchases") {
    // backward drops purchases before the first click; forward drops
    // purchases after the last click — both must stay within the
    // purchase set and agree on user ids
    val p = spark.read.parquet(s"$sf/events.parquet")
      .filter($"event_type" === "purchase").count()
    val fw = q("asof_forward").count()
    val bw = q("asof_attribution").count()
    assert(fw <= p && bw <= p && fw > 0 && bw > 0)
  }
}
