package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank: symmetric pair splits mass equally, exact recurrence") {
    // undirected single edge 1–2 (both directions): by symmetry both
    // nodes keep the same rank; one hand-computed round pins the
    // integer recurrence: contrib = 1e9 DIV 1 = 1e9,
    // pr' = 15e7 + (85 * 1e9) DIV 100 = 150000000 + 850000000 = 1e9
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = GraphOps.pagerankExact(e, "src", "dst", iters = 3)
      .orderBy($"node").as[(Long, Long)].collect()
    assert(r.toSeq == Seq((1L, 1000000000L), (2L, 1000000000L)))
  }

  test("pagerank: star center accumulates rank, leaves shed it") {
    // star 0–{1,2,3} symmetrized; after one round:
    // center gets 15e7 + 85*(3 * 1e9) DIV 100 = 2700000000
    // each leaf gets 15e7 + 85*(1e9 DIV 3) DIV 100 = 433333333
    val und = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val r1 = GraphOps.pagerankExact(e, "src", "dst", iters = 1)
      .orderBy($"node").as[(Long, Long)].collect().toSeq
    assert(r1.head == (0L, 2700000000L))
    assert(r1.tail.forall(_._2 == 150000000L + 85L * (1000000000L / 3) / 100))
    // more rounds keep the center strictly above the leaves
    val r5 = GraphOps.pagerankExact(e, "src", "dst", iters = 5)
      .orderBy($"node").as[(Long, Long)].collect().toSeq
    assert(r5.head._2 > r5.tail.map(_._2).max)
    // leaves stay mutually identical (graph automorphism ⇒ exact tie)
    assert(r5.tail.map(_._2).distinct.size == 1)
  }

  test("pagerank: dangling mass redistributes, unlinked node keeps floor") {
    // single DIRECTED edge 1→2: node 2 is dangling (no out-edge — its
    // whole rank is redistributed as dm DIV n), node 1 has no in-edge
    // (it must SURVIVE round 1 at the teleport + dangling-share floor,
    // the ADVICE-r7 defect). Hand-computed round 1 with unit=1e9:
    //   dm = 1e9 (node 2's seed), share = 1e9 DIV 2 = 5e8
    //   pr(1) = 15e7 + (85 · (0     + 5e8)) DIV 100 =   575,000,000
    //   pr(2) = 15e7 + (85 · (1e9   + 5e8)) DIV 100 = 1,425,000,000
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val r1 = GraphOps.pagerankExact(e, "src", "dst", iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 575000000L, 2L -> 1425000000L))
    // both nodes present after EVERY round, and total mass conserved
    // up to the documented DIV floor leakage (≤ a few hundred units
    // per node per round on this 2-node graph)
    val r4 = GraphOps.pagerankExact(e, "src", "dst", iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(r4.keySet == Set(1L, 2L))
    val mass = r4.values.sum
    assert(mass > 1999999000L && mass <= 2000000000L)
  }

  test("k-core peel: pendant drops, cycle survives, cascade empties") {
    // square 0-1-2-3-0 with pendant 4 off node 0: 2-core = the square
    // (pendant peels round 1; square is 2-regular, stable)
    val g = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L), (0L, 4L))
      .toDF("u", "v")
    val p2 = GraphOps.kCorePeel(g, "u", "v", k = 2, rounds = 3)
    assert(p2.last.select($"u").distinct().as[Long].collect().sorted
      .toSeq == Seq(0L, 1L, 2L, 3L))
    assert(p2(2).count() == p2(3).count()) // converged
    // 3-core of the same graph: empty (square is only 2-regular) —
    // the cascade must empty, not stabilize on a remnant
    val p3 = GraphOps.kCorePeel(g, "u", "v", k = 3, rounds = 3)
    assert(p3.last.count() == 0)
    // a path peels from both ends one round at a time: 0-1-2-3-4 at
    // k=2 loses ONLY its endpoints each round — fixed-round output is
    // the partially-peeled state when rounds is too small
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val pp = GraphOps.kCorePeel(path, "u", "v", k = 2, rounds = 1)
    assert(pp.last.select($"u").distinct().count() == 3) // 1,2,3 remain
  }

  test("triangles: K4, a path, and a square with one diagonal") {
    // K4: C(4,3)=4 triangles; wedges = 4 nodes × C(3,2) = 12
    val k4 = (for {
      u <- 0L to 3L; v <- 0L to 3L if u < v
    } yield (u, v)).toDF("u", "v")
    val t4 = GraphOps.triangleCounts(k4, "u", "v")
      .as[(Long, Long)].head()
    assert(t4 == ((4L, 12L)))
    // path 0-1-2-3: no triangles, wedges = 2 (at nodes 1 and 2)
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("u", "v")
    assert(GraphOps.triangleCounts(path, "u", "v")
      .as[(Long, Long)].head() == ((0L, 2L)))
    // square 0-1-2-3-0 plus diagonal 0-2: exactly 2 triangles
    val sq = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L), (0L, 2L))
      .toDF("u", "v")
    assert(GraphOps.triangleCounts(sq, "u", "v")
      .as[(Long, Long)].head()._1 == 2L)
  }
}
