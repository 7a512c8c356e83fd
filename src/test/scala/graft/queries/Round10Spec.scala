package graft.queries

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Property pins for the round-10 additions, beyond their oracle
  * gates: the RRF fusion is internally consistent with its own leg
  * ranks, the trigram index path equals an independent naive scan,
  * the Count-Min estimate dominates the true join size (and the
  * algebra is pinned on a hand-computed case with the production
  * hash constants), the runtime-filter gate restores every conf it
  * scopes, and the imputation median matches a driver-side exact
  * recount. All at sf0.001 — semantics pins, not scale runs. */
class Round10Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("rrf_fusion: fused score recomputes from the leg ranks, " +
      "ordering is total and non-increasing") {
    val out = Registry.queryMap("rrf_fusion")(spark, sf).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val lex = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val sem = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(lex.isDefined || sem.isDefined,
        "fused row in neither leg")
      val expect = lex.fold(0L)(k => 1000000L / (60 + k)) +
        sem.fold(0L)(k => 1000000L / (60 + k))
      assert(r.getLong(3) == expect,
        s"rrf_micro ${r.getLong(3)} != recomputed $expect")
    }
    val scores = out.map(_.getLong(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "fused output not sorted by score")
    // both legs contribute to the fused top-10 on this corpus — the
    // fusion is not vacuously one-legged
    assert(out.exists(r => !r.isNullAt(1)) &&
      out.exists(r => !r.isNullAt(2)))
  }

  test("substr_search_trgm: index+verify path equals the naive " +
      "full-scan, counts positive") {
    import spark.implicits._
    val out = Registry.queryMap("substr_search_trgm")(spark, sf)
      .collect()
    val naive = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"text".contains("ash jo"))
      .select($"doc_id").as[Long].collect().sorted
    assert(naive.nonEmpty, "fixture drift: pattern matches nothing")
    assert(out.map(_.getLong(0)).sorted.sameElements(naive),
      "trigram candidates+verify != naive scan")
    assert(out.forall(_.getLong(1) >= 1L))
  }

  test("joinsize_cm_sketch: overestimate theorem holds on the gated " +
      "run AND on a hand-computed case with the production hashes") {
    val r = Registry.queryMap("joinsize_cm_sketch")(spark, sf).first()
    val (nTrue, est) = (r.getLong(0), r.getLong(1))
    assert(r.getBoolean(2) && est >= nTrue && nTrue > 0)
    // hand case: L keys [1,1,2,3,7], O keys [1,2,2,9] →
    // true = 2*1 (k=1) + 1*2 (k=2) = 4; replicate the query's exact
    // hash family in plain Scala and check every per-row estimate
    // dominates and min is tight-or-above
    val P = 2147483647L; val W = 1024L
    val as = Seq(1299709L, 15485863L, 32452843L, 49979687L)
    val bs = Seq(104729L, 224737L, 350377L, 479909L)
    val l = Seq(1L, 1L, 2L, 3L, 7L); val o = Seq(1L, 2L, 2L, 9L)
    val trueSize = l.groupBy(identity).map { case (k, xs) =>
      xs.size.toLong * o.count(_ == k) }.sum
    assert(trueSize == 4L)
    val ests = as.indices.map { j =>
      def bkt(k: Long) = ((k * as(j) + bs(j)) % P) % W
      val cl = l.groupBy(bkt).map { case (b, xs) => b -> xs.size.toLong }
      val co = o.groupBy(bkt).map { case (b, xs) => b -> xs.size.toLong }
      cl.map { case (b, c) => c * co.getOrElse(b, 0L) }.sum
    }
    assert(ests.forall(_ >= trueSize))
    assert(ests.min >= trueSize)
  }

  test("runtime_filter_join: bloom injected, answer right, and every " +
      "scoped conf restored after the run") {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val before = keys.map(k => k -> spark.conf.getOption(k))
    val r = Registry.queryMap("runtime_filter_join")(spark, sf).first()
    assert(r.getBoolean(2), "BloomFilterMightContain not injected")
    import spark.implicits._
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val os = spark.read.parquet(s"$sf/orders.parquet")
      .filter($"o_orderpriority" === "1-URGENT")
    val n = li.join(os, $"l_orderkey" === $"o_orderkey").count()
    assert(r.getLong(0) == n, s"join count ${r.getLong(0)} != $n")
    val after = keys.map(k => k -> spark.conf.getOption(k))
    assert(before == after, s"confs not restored: $before vs $after")
  }

  test("ml_pca_contract: all three contract booleans hold") {
    val r = Registry.queryMap("ml_pca_contract")(spark, sf).first()
    assert(r.getLong(0) > 0 && r.getLong(1) == 8L)
    assert(r.getBoolean(2), "loadings not orthonormal")
    assert(r.getBoolean(3), "explainedVariance not ordered")
    assert(r.getBoolean(4), "projected variances not ordered")
  }

  test("impute_median: median and imputed total match a driver-side " +
      "exact recount") {
    import spark.implicits._
    val out = Registry.queryMap("impute_median")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select($"event_type",
        floor($"value" * 1000000d + 0.5d).cast("long").as("vm"))
      .as[(String, Long)].collect()
    ev.groupBy(_._1).foreach { case (t, rows) =>
      val vms = rows.map(_._2)
      val (miss, keep) = vms.partition(_ % 97 == 0)
      val sorted = keep.sorted
      val n = sorted.length
      // exact interpolated median in doubled units (ints → the .5
      // case is (lo+hi), exactly)
      val med2 =
        if (n % 2 == 1) 2L * sorted(n / 2)
        else sorted(n / 2 - 1) + sorted(n / 2)
      val (gn, gmiss, gmed2, gtot2) = out(t)
      assert(gn == vms.length.toLong)
      assert(gmiss == miss.length.toLong)
      assert(gmed2 == med2, s"$t: median2 $gmed2 != $med2")
      val tot2 = keep.map(2L * _).sum + miss.length * med2
      assert(gtot2 == tot2, s"$t: total2 $gtot2 != $tot2")
    }
  }
}
