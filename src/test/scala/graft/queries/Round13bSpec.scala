package graft.queries

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Property pins for the round-13b closures, beyond the oracle gates:
  *
  *  - the warm fused probe (both persisted indexes + RRF) lands on the
  *    in-plan [[Retrieval.rrf_fusion]]'s answer row-for-row — the two
  *    lexical legs take DIFFERENT certified numeric paths (decimal
  *    posting sums vs the fixed-association double tree), so equality
  *    of the fused output is a real reconciliation, not a replay;
  *  - the fused output genuinely exercises fusion (some doc carries
  *    BOTH ranks, some docs are single-leg) — the gate can't pass on
  *    one degenerate leg;
  *  - the production-knob fused probe keeps its contract at the spec
  *    SF and its n_exact is the full 10 (the recall denominator is
  *    never vacuously small);
  *  - ann_retrain_apply's whole decision loop holds at the spec SF:
  *    verdict fires on the drifted batch, the rebuilt index is
  *    balanced, the post-retrain full probe is exact.
  */
class Round13bSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("rrf_probe_persisted ≡ rrf_fusion in-engine — warm dual-index " +
      "serving and the cold in-plan fusion agree row-for-row") {
    val cold = Registry.queryMap("rrf_fusion")(spark, sf)
      .select(col("doc_id"), col("lex_rank"), col("sem_rank"),
        col("rrf_micro"))
      .collect().map(_.toSeq).toSeq
    val warm = Registry.queryMap("rrf_probe_persisted")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(warm == cold,
      s"cold fusion:\n$cold\nwarm fused probe:\n$warm")
    assert(warm.nonEmpty, "no fused rows — the pin is vacuous")
  }

  test("the fused top-10 genuinely fuses: at least one doc carries " +
      "both ranks and at least one doc is single-leg on each side") {
    val rows = Registry.queryMap("rrf_probe_persisted")(spark, sf)
      .collect()
    assert(rows.exists(r => !r.isNullAt(1) && !r.isNullAt(2)),
      "no doc ranked by BOTH legs — fusion is degenerate")
    assert(rows.exists(r => r.isNullAt(1)),
      "no sem-only doc — the lexical leg dominates vacuously")
    assert(rows.exists(r => r.isNullAt(2)),
      "no lex-only doc — the semantic leg dominates vacuously")
  }

  test("rrf_probe_merged ≡ rrf_probe_persisted in-engine — the " +
      "evolving-corpus hybrid (base ∪ delta segments, frozen " +
      "base-trained quantizer) and the single-segment hybrid serve " +
      "identical fused answers") {
    def rows(n: String) = Registry.queryMap(n)(spark, sf)
      .collect().map(_.toSeq).toSeq
    val merged = rows("rrf_probe_merged")
    assert(merged == rows("rrf_probe_persisted"),
      "the merged hybrid probe diverged from the single-segment one")
    assert(merged.nonEmpty, "no fused rows — the pin is vacuous")
  }

  test("rrf_probe_production holds its contract at the spec SF with " +
      "the full 10-row denominator") {
    val r = Registry.queryMap("rrf_probe_production")(spark, sf)
      .collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 10L,
      s"exact fused set is not 10 rows: ${r(0)}")
    assert(r(0).getBoolean(1), s"fused recall contract broke: ${r(0)}")
  }

  test("the epoch-manifest probes time-travel correctly: epoch 2 ≡ " +
      "the full-corpus answers in-engine, and epoch 1 never surfaces " +
      "a delta doc/vector — segment immutability IS the snapshot") {
    import spark.implicits._
    val bm = Registry.queryMap("bm25_probe_asof")(spark, sf)
    val bmE2 = bm.filter($"epoch" === 2).drop("epoch")
      .collect().map(_.toSeq).toSeq
    val cold = Registry.queryMap("bm25_join_topk")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(bmE2 == cold, "epoch-2 text probe diverged from the cold scan")
    assert(bm.filter($"epoch" === 1 && $"doc_id" % 10 === 0).count() == 0,
      "a delta doc surfaced in the epoch-1 snapshot")
    val ann = Registry.queryMap("ann_probe_asof")(spark, sf)
    val annE2 = ann.filter($"epoch" === 2).drop("epoch")
      .collect().map(_.toSeq).toSeq
    val full = Registry.queryMap("sim_ivf_fullprobe")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(annE2 == full,
      "epoch-2 ANN probe diverged from the in-plan full probe")
    assert(ann.filter($"epoch" === 1 && $"neighbor_id" % 10 === 7)
      .count() == 0, "a delta vector surfaced in the epoch-1 snapshot")
    assert(bmE2.nonEmpty && annE2.nonEmpty, "vacuous pin")
    val tg = Registry.queryMap("trgm_probe_asof")(spark, sf)
    val tgE2 = tg.filter($"epoch" === 2).drop("epoch")
      .collect().map(_.toSeq).toSeq
    val naive = Registry.queryMap("substr_search_trgm")(spark, sf)
      .select($"doc_id", $"n_occurrences")
      .collect().map(_.toSeq).toSeq
    assert(tgE2 == naive,
      "epoch-2 trigram probe diverged from the in-plan substring search")
    assert(tg.filter($"epoch" === 1 && $"doc_id" % 10 === 0).count() == 0,
      "a delta doc surfaced in the epoch-1 trigram snapshot")
    assert(tgE2.nonEmpty, "no substring hits — the trigram pin is vacuous")
  }

  test("ann_retrain_apply closes the decision loop: the drifted batch " +
      "fires the verdict, the rebuilt quantizer is balanced, and the " +
      "post-retrain full probe reproduces brute force") {
    val r = Registry.queryMap("ann_retrain_apply")(spark, sf).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getLong(0) > 0L, "empty drifted batch — vacuous")
    assert(row.getBoolean(1), "the drift never fired the verdict")
    assert(!row.getBoolean(2), "the rebuilt index still trips the " +
      "threshold — retraining did not rebalance")
    assert(row.getBoolean(3), "balance did not improve")
    assert(row.getBoolean(4), "the post-retrain probe lost exactness")
  }
}
