package graft.queries

import graft.{Registry, SparkSpec}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Property pins for the round-10 second wave, beyond the oracle
  * gates: the stats queries (grouped_ols, ab_welch_t, twap) recompute
  * exactly from driver-side BigInt recounts; grouped_ols and
  * cdc_apply additionally pin HAND-COMPUTED golden vectors through
  * synthetic parquet tables (a perfect line must fit with slope
  * 2e6 µ/s and r² = 1; a delete-after-update log must land the key in
  * the __DELETED__ audit group); interval_concurrency equals a naive
  * marker replay; sample_reservoir's selection equals the 100 lowest
  * driver-computed md5 priorities per group (value-blindness);
  * quantile_bins equals a sorted-array recount of the interpolated
  * cutpoints; and dedup_containment finds a small-inside-big plant
  * that the symmetric Jaccard path (verifiedNearDups ≥ 0.8) provably
  * cannot — the blind spot the operator exists for. */
class Round10bSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def eventRows() = {
    import spark.implicits._
    spark.read.parquet(s"$sf/events.parquet")
      .select($"event_type", $"event_id",
        expr("unix_micros(cast(ts as timestamp))").as("us"),
        floor($"value" * 1000000d + 0.5d).cast("long").as("vm"))
      .as[(String, Long, Long, Long)].collect()
  }

  test("grouped_ols: slope and r2 recompute from a BigInt recount; " +
      "a synthetic perfect line fits with slope 2e6 and r2 = 1") {
    val rows = eventRows()
    val out = Registry.queryMap("grouped_ols")(spark, sf).collect()
    assert(out.length == 5)
    val byType = rows.groupBy(_._1)
    out.foreach { r =>
      val g = byType(r.getString(0))
      val n = BigInt(g.length)
      val xs = g.map(t => BigInt(t._3 / 1000000L - 1704067200L))
      val ys = g.map(t => BigInt(t._4))
      val (sx, sy) = (xs.sum, ys.sum)
      val num = n * xs.zip(ys).map { case (a, b) => a * b }.sum - sx * sy
      val den = n * xs.map(a => a * a).sum - sx * sx
      val dyy = n * ys.map(b => b * b).sum - sy * sy
      assert(r.getLong(1) == g.length && r.getLong(2) == sx.toLong &&
        r.getLong(3) == sy.toLong)
      assert(math.abs(r.getDouble(4) - num.toDouble / den.toDouble)
        < 2e-6, s"slope mismatch for ${r.getString(0)}")
      assert(math.abs(r.getDouble(5) - (num.toDouble / den.toDouble) *
        (num.toDouble / dyy.toDouble)) < 2e-6, "r2 mismatch")
    }
    // golden vector: y = 1 + 2x over x = 0..3 s from the epoch anchor
    val dir = java.nio.file.Files.createTempDirectory("ols").toString
    try {
      import spark.implicits._
      (0 to 3).map(x => (x.toLong,
          java.sql.Timestamp.from(java.time.Instant
            .ofEpochSecond(1704067200L + x)),
          1L, "line", 1.0 + 2.0 * x))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.parquet(s"$dir/events.parquet")
      val g = Registry.queryMap("grouped_ols")(spark, dir).collect()
      assert(g.length == 1 && g(0).getDouble(4) == 2000000.0 &&
        g(0).getDouble(5) == 1.0, g.mkString(","))
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir))
  }

  test("ab_welch_t: t, df and the significance decision recompute " +
      "from exact per-arm sums") {
    import spark.implicits._
    val rows = spark.read.parquet(s"$sf/events.parquet")
      .select($"event_type", ($"user_id" % 2 === 0L).as("a"),
        floor($"value" * 1000000d + 0.5d).cast("long").as("y"))
      .as[(String, Boolean, Long)].collect()
    val out = Registry.queryMap("ab_welch_t")(spark, sf).collect()
    assert(out.length == 5)
    out.foreach { r =>
      val g = rows.filter(_._1 == r.getString(0))
      val (ga, gb) = g.partition(_._2)
      val (na, nb) = (ga.length.toDouble, gb.length.toDouble)
      val (sa, sb) = (ga.map(_._3).sum.toDouble, gb.map(_._3).sum.toDouble)
      val qa = ga.map(t => BigInt(t._3) * BigInt(t._3)).sum.toDouble
      val qb = gb.map(t => BigInt(t._3) * BigInt(t._3)).sum.toDouble
      val va = (qa - sa * sa / na) / (na - 1)
      val vb = (qb - sb * sb / nb) / (nb - 1)
      val t = (sa / na - sb / nb) / math.sqrt(va / na + vb / nb)
      assert(r.getLong(1) == ga.length && r.getLong(2) == gb.length)
      assert(math.abs(r.getDouble(5) - t) < 1e-5, "t mismatch")
      assert(r.getBoolean(7) == (math.abs(t) > 1.96),
        "significance decision diverges from the recount")
    }
  }

  test("interval_concurrency: peak and first-attained time equal a " +
      "naive marker replay") {
    val D = 86400000000L
    val marks = eventRows().flatMap { case (et, id, us, vm) =>
      val dur = vm % 3600L * 1000000L + 1000000L
      val fin = us + dur
      val bound = (us / D + 1L) * D
      val segs = Seq((us, math.min(fin, bound))) ++
        (if (fin > bound) Seq((bound, fin)) else Nil)
      segs.flatMap { case (s, e) =>
        Seq((et, s / D, s, 1L, id), (et, s / D, e, -1L, id)) }
    }
    val expected = marks.groupBy(m => (m._1, m._2)).map {
      case ((et, day), ms) =>
        val ordered = ms.sortBy(m => (m._3, -m._4, m._5))
        val runs = ordered.scanLeft(0L)((acc, m) => acc + m._4).tail
        val peak = runs.max
        val at = ordered(runs.indexOf(peak))._3
        (et, day) -> (peak, at)
    }
    val out = Registry.queryMap("interval_concurrency")(spark, sf)
      .collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val (p, at) = expected((r.getString(0), r.getLong(1)))
      assert(r.getLong(2) == p && r.getLong(3) == at,
        s"(${r.getString(0)}, ${r.getLong(1)}): " +
          s"got (${r.getLong(2)}, ${r.getLong(3)}) want ($p, $at)")
    }
  }

  test("twap: hold-segment recount matches; a group's TWAP lies " +
      "within its observed value range") {
    val D = 86400000000L
    val out = Registry.queryMap("twap")(spark, sf).collect()
    val byKey = eventRows().groupBy(e => (e._1, e._3 / D))
    assert(out.length == byKey.size)
    out.foreach { r =>
      val g = byKey((r.getString(0), r.getLong(1)))
        .sortBy(e => (e._3, e._2))
      val end = (r.getLong(1) + 1L) * D
      val durs = g.indices.map { i =>
        (if (i == g.length - 1) end else g(i + 1)._3) - g(i)._3 }
      val num = g.indices.map(i => BigInt(g(i)._4) * BigInt(durs(i))).sum
      val den = durs.map(BigInt(_)).sum
      assert(r.getLong(2) == g.length && r.getLong(3) == den.toLong)
      val tw = num.toDouble / den.toDouble / 1e6
      assert(math.abs(r.getDouble(4) - tw) < 1e-5)
      val vs = g.map(_._4.toDouble / 1e6)
      assert(r.getDouble(4) >= vs.min - 1e-6 &&
        r.getDouble(4) <= vs.max + 1e-6,
        "TWAP escaped the observed range")
    }
  }

  test("cdc_apply: a delete-after-update key lands in __DELETED__ " +
      "with its last-known value; updates after deletes resurrect — " +
      "hand-computed golden log") {
    import spark.implicits._
    val day0 = java.sql.Timestamp.valueOf("1995-01-01 00:00:00")
    val day1 = java.sql.Timestamp.valueOf("1995-01-02 00:00:00")
    // key 1: U(k=3, $10) then D(k=7) on a later day  -> deleted, $10? no:
    //   delete carries its own cents ($30) - last-known = the D row's
    // key 2: D(k=14) then U(k=15, $20) later         -> live,  $20
    // key 3: single U(k=5, $50)                      -> live,  $50
    val orders = Seq(
      (3L, 1L, "O", 10.0, day0, "1-URGENT"),
      (7L, 1L, "O", 30.0, day1, "1-URGENT"),
      (14L, 2L, "O", 99.0, day0, "2-HIGH"),
      (15L, 2L, "O", 20.0, day1, "2-HIGH"),
      (5L, 3L, "O", 50.0, day0, "3-MEDIUM"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val dir = java.nio.file.Files.createTempDirectory("cdc").toString
    try {
      orders.write.parquet(s"$dir/orders.parquet")
      val out = Registry.queryMap("cdc_apply")(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(out.toSet == Set(
        ("2-HIGH", 1L, 2000L), ("3-MEDIUM", 1L, 5000L),
        ("__DELETED__", 1L, 3000L)), out.mkString(","))
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir))
  }

  test("sample_reservoir: the selection is exactly the 100 lowest " +
      "md5 priorities per group — value-blind by construction") {
    val rows = eventRows()
    val expected = rows.groupBy(_._1).map { case (et, g) =>
      et -> g.map(e => (md5hex(e._2.toString + ":r10"), e._2))
        .sorted.take(100).map(_._2).toSet
    }
    val out = Registry.queryMap("sample_reservoir")(spark, sf).collect()
    val got = out.groupBy(_.getString(0))
      .map { case (et, rs) => et -> rs.map(_.getLong(2)).toSet }
    assert(got == expected)
    // rn is 1..k dense per group
    out.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length))
    }
  }

  test("quantile_bins: counts equal a sorted-array recount of the " +
      "interpolated cutpoints; totals preserved") {
    import spark.implicits._
    val cents = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(floor($"l_extendedprice" * 100d + 0.5d).cast("long"))
      .as[Long].collect().sorted
    val n = cents.length
    val cut10 = (1 to 9).map { k =>
      val rank = k.toDouble / 10 * (n - 1)
      val lo = rank.toInt
      val v = cents(lo) + (cents(math.min(lo + 1, n - 1)) - cents(lo)) *
        (rank - lo)
      math.floor(v * 10 + 0.5).toLong
    }
    val expected = cents.groupBy(c => cut10.count(_ <= c * 10L))
      .map { case (b, g) => b -> (g.length.toLong, g.sum) }
    val out = Registry.queryMap("quantile_bins")(spark, sf).collect()
    assert(out.map(_.getLong(1)).sum == n.toLong)
    out.foreach { r =>
      val (cnt, sm) = expected(r.getLong(0).toInt)
      assert(r.getLong(1) == cnt && r.getLong(2) == sm,
        s"bin ${r.getLong(0)}")
    }
  }

  test("mm_dedup_phash: banded blocking is COMPLETE at Hamming <= 3 " +
      "(pigeonhole, validated by an exhaustive recount) and every " +
      "byte-identical plant is found at distance 0") {
    import graft.operators.Multimodal
    import spark.implicits._
    val media = Multimodal.toPpm(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text")
    val plants = media.filter($"media_id" % 10 === 0L)
      .withColumn("media_id", -$"media_id" - 1L)
    val hs = Multimodal.perceptualHash(media.unionByName(plants))
      .select($"media_id", $"b0", $"b1", $"b2", $"b3")
      .as[(Long, Long, Long, Long, Long)].collect()
    def ham(a: (Long, Long, Long, Long, Long),
        b: (Long, Long, Long, Long, Long)): Int =
      java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3) +
        java.lang.Long.bitCount(a._4 ^ b._4) +
        java.lang.Long.bitCount(a._5 ^ b._5)
    val brute = (for {
      i <- hs.indices; j <- hs.indices if hs(i)._1 < hs(j)._1
      h = ham(hs(i), hs(j)) if h <= 3
    } yield (hs(i)._1, hs(j)._1, h.toLong)).toSet
    val got = Registry.queryMap("mm_dedup_phash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute,
      s"banded join != exhaustive scan: missing ${brute -- got}, " +
        s"extra ${got -- brute}")
    // every plant pairs with its original at distance 0
    val ids = hs.map(_._1).toSet
    ids.filter(_ < 0).foreach { pid =>
      assert(got.contains((pid, -pid - 1L, 0L)),
        s"plant $pid not recovered at Hamming 0")
    }
  }

  test("dedup_containment: finds a small-inside-big plant that the " +
      "symmetric Jaccard path provably cannot; invariants hold on " +
      "the organic corpus") {
    import spark.implicits._
    // toy: doc 2 = first 12 of doc 1's 100 distinct tokens
    //  -> containment(2 in 1) = 1.0, Jaccard = 10/98 << 0.8
    val big = (0 until 100).map(i => s"tk$i").mkString(" ")
    val small = (0 until 12).map(i => s"tk$i").mkString(" ")
    val noise = (0 until 40).map(i => s"zz$i").mkString(" ")
    val toy = Seq((1L, big), (2L, small), (3L, noise))
      .toDF("doc_id", "text")
    val byCont = Dedup.containmentNearDups(toy, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(byCont.toSet == Set((2L, 1L)), byCont.mkString(","))
    val byJac = Dedup.verifiedNearDups(toy, "doc_id", "text", 0.8)
      .collect()
    assert(byJac.isEmpty,
      "Jaccard path unexpectedly surfaced the containment pair")
    // organic invariants: orientation small-first, exact-integer gate
    val out = Registry.queryMap("dedup_containment")(spark, sf).collect()
    out.foreach { r =>
      val (d1, d2, inter, n1, n2) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(d1 != d2 && n1 <= n2 && inter <= n1 &&
        inter * 10 >= n1 * 9, r.toString)
    }
  }
}
