package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val trades = Seq(
    (1L, 10L, "t1"), (1L, 25L, "t2"), (2L, 5L, "t3"), (3L, 50L, "t4"))
    .toDF("k", "ts", "trade")
  private val quotes = Seq(
    (1L, 8L, 100.0), (1L, 10L, 101.0), (1L, 20L, 102.0),
    (2L, 9L, 200.0))
    .toDF("k", "qts", "price")

  test("backward as-of: latest right row with ts ≤ left ts, per key") {
    val out = AsOfJoin.asofBackward(trades, quotes, Seq("k"),
        "ts", "qts", Seq("price"))
      .collect().map(r => r.getAs[String]("trade") ->
        r.getAs[Double]("price")).toMap
    assert(out("t1") == 101.0) // equal ts counts (≤ semantics)
    assert(out("t2") == 102.0) // latest earlier quote
    assert(!out.contains("t3")) // quote at 9 is AFTER trade at 5 → no match
    assert(!out.contains("t4")) // key 3 has no quotes at all
  }

  test("forward as-of: earliest right row with ts ≥ left ts, per key") {
    val out = AsOfJoin.asofForward(trades, quotes, Seq("k"),
        "ts", "qts", Seq("price"))
      .collect().map(r => r.getAs[String]("trade") ->
        r.getAs[Double]("price")).toMap
    assert(out("t1") == 101.0) // equal ts counts (≥ semantics, inclusive)
    assert(!out.contains("t2")) // no quote at-or-after ts=25 → dropped
    assert(out("t3") == 200.0)  // quote at 9 is the next after trade at 5
    assert(!out.contains("t4")) // key 3 has no quotes at all
  }

  test("forward/backward agree on exact-ts hits and partition the rest") {
    // at an exact timestamp match both directions return that same row
    val fw = AsOfJoin.asofForward(trades, quotes, Seq("k"),
      "ts", "qts", Seq("price")).collect()
      .map(r => r.getAs[String]("trade") -> r.getAs[Double]("price")).toMap
    val bw = AsOfJoin.asofBackward(trades, quotes, Seq("k"),
      "ts", "qts", Seq("price")).collect()
      .map(r => r.getAs[String]("trade") -> r.getAs[Double]("price")).toMap
    assert(fw("t1") == bw("t1")) // ts=10 exists on both sides
  }

  test("as-of output carries all left columns and renames nothing else") {
    val out = AsOfJoin.asofBackward(trades, quotes, Seq("k"),
      "ts", "qts", Seq("price"))
    assert(out.columns.toSet == Set("k", "ts", "trade", "price"))
  }

  test("binned range join equals the naive inequality join") {
    val points = Seq((1L, 5L, "p1"), (1L, 95L, "p2"), (1L, 250L, "p3"),
      (2L, 10L, "p4")).toDF("k", "t", "p")
    val intervals = Seq((1L, 0L, 100L, "i1"), (1L, 90L, 260L, "i2"),
      (2L, 50L, 60L, "i3")).toDF("k", "lo", "hi", "i")
    val binned = RangeJoin.pointInInterval(points, intervals, Seq("k"),
      "t", "lo", "hi", binWidth = 64)
      .select("p", "i").collect().map(r => (r.getString(0), r.getString(1)))
      .toSet
    val naive = points.join(intervals, Seq("k"))
      .filter($"t" >= $"lo" && $"t" <= $"hi")
      .select("p", "i").collect().map(r => (r.getString(0), r.getString(1)))
      .toSet
    assert(binned == naive)
    // p2 matches BOTH overlapping intervals; p3 only the long one, which
    // spans multiple bins (replication path); p4 matches nothing
    assert(binned == Set(("p1", "i1"), ("p2", "i1"), ("p2", "i2"),
      ("p3", "i2")))
  }
}
