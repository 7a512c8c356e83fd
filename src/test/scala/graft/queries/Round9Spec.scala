package graft.queries

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Property pins for the round-9 additions, beyond their oracle
  * gates: the capped miner's output stays inside the exact miner's
  * candidate universe, the budget planner's integer plan respects
  * its own budget, the calibration sweep is a genuine survivor
  * curve, and the composed release pipeline's fill geometry is
  * contiguous. All at sf0.001 — these are semantics pins, not
  * scale runs. */
class Round9Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("hard_negatives_capped: pairs are same-bucket different-label, " +
      "top-2 shape, anchors covered vs the exact miner") {
    import graft.functions.VectorExprs.rpBuckets
    import graft.operators.Similarity
    import spark.implicits._
    val out = Registry.queryMap("hard_negatives_capped")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    // shape: rk in {1,2}, <=2 rows per anchor, neg != anchor
    assert(out.forall(r => r.getLong(1) == 1L || r.getLong(1) == 2L))
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 2)
      assert(rs.map(_.getLong(2)).distinct.length == rs.length)
    }
    assert(out.forall(r => r.getLong(0) != r.getLong(2)))
    // every emitted pair collides in some table AND crosses labels —
    // i.e. it lies in the EXACT miner's candidate universe (the cap
    // only prunes, never invents)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
    val bits = Similarity.autoBits(vecs.count())
    val bk = vecs.select($"vec_id", $"label",
        posexplode(rpBuckets($"embedding", 4, bits)).as(Seq("t", "bkt")))
      .collect()
      .groupBy(_.getLong(0))
    val labels = bk.map { case (id, rs) => id -> rs.head.getInt(1) }
    out.foreach { r =>
      val (a, n) = (r.getLong(0), r.getLong(2))
      assert(labels(a) != labels(n), s"same-label pair $a,$n")
      val collides = bk(a).exists(x => bk(n).exists(y =>
        x.getInt(2) == y.getInt(2) && x.getInt(3) == y.getInt(3)))
      assert(collides, s"pair $a,$n shares no bucket in any table")
    }
    // coverage: the cap may drop negatives but at this SF (bucket
    // occupancy ~ the cap) nearly every exact-mined anchor survives
    val exact = Registry.queryMap("hard_negatives")(spark, sf)
      .select($"anchor").distinct().as[Long].collect().toSet
    val capped = out.map(_.getLong(0)).toSet
    assert(capped.subsetOf(exact),
      "capped mined an anchor the exact miner did not")
    assert(capped.size * 10 >= exact.size * 9,
      s"coverage ${capped.size}/${exact.size} below 90%")
  }

  test("mix_budget: plan respects its own budget, thresholds and " +
      "yields bounded by construction") {
    val rows = Registry.queryMap("mix_budget")(spark, sf).collect()
    assert(rows.nonEmpty)
    val budget = rows.head.getLong(3)
    assert(rows.forall(_.getLong(3) == budget))
    // sum of floor-divided targets never exceeds the budget
    assert(rows.map(_.getLong(4)).sum <= budget)
    rows.foreach { r =>
      val (srcDocs, srcTok, target, keepBelow, keptDocs, keptTok) =
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))
      assert(target <= budget && target >= 0)
      assert(keepBelow >= 0 && keepBelow <= 1048576L)
      assert(keptDocs <= srcDocs && keptTok <= srcTok)
      // a full threshold keeps the whole source
      if (keepBelow == 1048576L)
        assert(keptDocs == srcDocs && keptTok == srcTok)
    }
  }

  test("quality_threshold_sweep: 21-row survivor curve, monotone " +
      "non-increasing, row 0 = whole corpus") {
    import graft.operators.{TextAnalysis => TA}
    val rows = Registry.queryMap("quality_threshold_sweep")(spark, sf)
      .collect()
    assert(rows.length == 21)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i && r.getLong(1) == i * 50000L)
    }
    val docs = rows.map(_.getLong(2))
    val toks = rows.map(_.getLong(3))
    assert(docs.zip(docs.tail).forall { case (a, b) => a >= b })
    assert(toks.zip(toks.tail).forall { case (a, b) => a >= b })
    // quality >= 0 always, so threshold 0 keeps everything
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    val total = corpus.count()
    val totalTok = corpus
      .agg(sum(TA.tokenCount(col("text")))).head().getLong(0)
    assert(docs.head == total && toks.head == totalTok)
  }

  test("corpus_release_e2e: contiguous fill geometry, every sequence " +
      "full except the ragged tail") {
    val rows = Registry.queryMap("corpus_release_e2e")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.zipWithIndex.foreach { case (r, i) =>
      val (seqId, nTok, start, end, full) =
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5))
      assert(seqId == i, "sequence ids must be dense from 0")
      assert(start == i * 256L, s"seq $i starts at $start")
      assert(end == start + nTok)
      assert(full == (nTok == 256L))
      if (i < rows.length - 1) assert(nTok == 256L,
        s"non-tail seq $i underfilled: $nTok")
    }
    // released text is scrubbed: the planted PII never reaches packing
    // (checked indirectly: the scrub stage's placeholder tokens add a
    // fixed 7 tokens per doc; a scrub no-op would shift every offset
    // and the oracle hash, itself covered by the correctness gate)
  }
}
