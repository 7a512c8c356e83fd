package graft

import org.apache.spark.sql.SparkSession

/** Full-registry decade sweep over the data-sensitive tail (VERDICT r5
  * item 4): time each query at a baseline dir (sf0.1) and a MkScale'd
  * 10× dir (/tmp/sf1), min-of-3 per dir after a warm-up pass, and print
  * one JSON line per query plus a summary table sorted by ratio.
  *
  * The query list is restricted to queries that read ONLY the tables
  * MkScale scales (documents, embeddings, events, orders) — anything
  * joining an unscaled table would measure a mixed-scale plan and say
  * nothing about growth. upsert_snapshot (customer) and q1_agg
  * (lineitem) are excluded for exactly that reason.
  *
  * Usage: sbt "runMain graft.ScaleSweep /root/testdata/sf0.1 /tmp/sf1"
  */
object ScaleSweep {
  /** The data-sensitive tail, grouped by the table that grows. */
  val tail: Seq[String] = Seq(
    // documents-backed pipeline
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_ngram_steep", "dedup_ngram_steep_recall",
    "dedup_clusters", "dedup_canonical",
    "text_tokens", "text_quality", "text_langid", "text_fingerprint",
    "text_pii_scrub", "text_repetition", "decontaminate",
    "split_shuffle", "mix_temperature", "curriculum_buckets",
    "pack_sequences",
    "heavy_hitters", "text_tfidf", "layout_report",
    "index_postings", "bm25_topk", "bm25_join_topk", "dedup_incremental",
    // embeddings-backed similarity/dedup
    "dedup_embedding_cosine", "dedup_semantic", "dedup_embedding_lsh",
    "dedup_lsh_recall", "sim_topk_bruteforce", "sim_lsh_bucketed",
    "sim_ivf_topk", "sim_ivf_fullprobe", "sim_ivf_recall",
    "sim_rplsh_recall", "sim_pq_recall", "sim_ivfpq_recall",
    // events-backed windows/folds
    "w1_running_sum", "sessionize", "scd2_islands", "a2_ratios", "a3_fold_avg_of_avgs",
    "a4_fold_ewma", "a6_last_value", "c1_json_extract",
    "stream_window_agg", "stream_sessions", "stream_interval_join",
    "stream_dedup", "stream_ivm_refresh",
    // orders-backed windows
    "w2_rank_lag", "w3_distribution", "w4_range_frame",
    "w5_range_prefix", "w6_range_avg", "w7_range_minmax", "c7_date_agg",
    "winsorize_clip",
    // r7 late additions: documents (spans), lineitem (profiling),
    // orders lifecycle (partition pruning)
    "dedup_spans", "profile_columns", "histogram_prices",
    "partition_prune", "bucketed_join", "profile_ndv_approx", "text_clean",
    // round-7 second wave: events grid (resample_ffill), lineitem
    // graph + observation (graph_*, observed_metrics), documents
    // linkage/routing (fuzzy_match_blocked, json_corrupt_routing)
    "resample_ffill", "graph_pagerank", "graph_triangles", "graph_kcore",
    "observed_metrics", "fuzzy_match_blocked", "json_corrupt_routing",
    // round-7 third wave: corpus preparation (documents / embeddings /
    // events — all MkScale-scaled)
    "chunk_windows", "chunk_dedup", "znorm_features", "embed_quant_int8", "anonymize_ids", "kanon_suppress",
    "ivm_agg_refresh", "drift_chi2", "source_cap", "source_cap_agg",
    // round-8 wave: graph lifecycle (lineitem), winsorize scale path
    // (orders), analytics (documents / events)
    "graph_edges", "graph_pagerank_directed", "graph_components",
    "winsorize_approx", "sample_weighted", "ngram_topk",
    "vocab_coverage", "label_gini", "funnel_steps",
    // round-8 second wave: temporal (events), exact stats (lineitem),
    // mining (embeddings)
    "asof_forward", "window_distinct_users", "split_time_embargo",
    "corr_matrix_exact", "hard_negatives",
    // round-8 third wave: join-view IVM (lineitem+orders), neighbor
    // similarity over the lifecycle edge table (lineitem)
    "ivm_join_refresh", "graph_jaccard",
    // round-8 fourth wave: product analytics (events) + the
    // stream-static gate. stream_static_join DOES touch the unscaled
    // customer table, but as the broadcast dimension of a growing
    // stream — dim-fixed/stream-growing IS the production shape this
    // topology models, so the mixed-scale rule doesn't disqualify it.
    "retention_cohorts", "event_transitions", "stream_static_join",
    // interpolation twin of resample_ffill (events); exact mode
    // (lineitem)
    "resample_interp", "agg_mode",
    // round-9: bounded-occupancy mining twin + its planted-recall
    // gate (embeddings); the composed release pipeline (documents)
    "hard_negatives_capped", "hard_negatives_capped_recall",
    "corpus_release_e2e",
    // round-9 second wave: release planning (documents)
    "mix_budget", "quality_threshold_sweep",
    // round-9 third wave: phrase retrieval (documents), sketch-IVM
    // NDV + CUSUM changepoint (events), incremental edge maintenance
    // (lineitem)
    "phrase_query", "ndv_sketch_merge", "cusum_changepoint",
    "graph_ivm_edges",
    // round-9 fourth wave: tokenizer induction + collocations + AND
    // retrieval (documents), nearest as-of (events)
    "bpe_train", "collocations_pmi", "conjunctive_query",
    "asof_nearest",
    // round-9 fifth wave: BPE corpus encoding + cross-source
    // contamination matrix (documents)
    "bpe_encode", "source_overlap",
    // round-9 sixth wave: truncation quality curve (embeddings),
    // two-phase per-group top-k (orders)
    "embed_truncate", "topk_per_group",
    // round-9 seventh wave: train/test contamination audit
    // (documents) + robust MAD outlier report (events)
    "split_leakage", "outliers_mad",
    // round-10 wave: hybrid retrieval + trigram substring search
    // (documents + embeddings), CM-sketch join sizing + runtime
    // bloom-filter join (lineitem + orders), PCA contract
    // (embeddings), median imputation (events)
    "rrf_fusion", "substr_search_trgm", "joinsize_cm_sketch",
    "runtime_filter_join", "ml_pca_contract", "impute_median",
    // round-10 second wave: grouped trend/test stats + sweep-line
    // concurrency + TWAP (events), CDC apply + equi-depth binning
    // (orders + lineitem), containment dedup + its recall gate
    // (documents), uniform per-group reservoir (events)
    "grouped_ols", "ab_welch_t", "interval_concurrency", "twap",
    "cdc_apply", "quantile_bins", "sample_reservoir",
    "dedup_containment", "dedup_containment_recall",
    // round-10 third wave: the sixth streaming gate (orders-backed
    // CDC replay through the FMGWS LWW machine); block-delta varint
    // posting layout (documents)
    "stream_cdc_apply", "postings_delta",
    // round-11 wave: persisted-index lifecycle (documents) — the
    // build query prices the segment derivation (reset like
    // graph_edges), the probes price the warm-index steady state;
    // approx decile binning (lineitem); the mm family's first sweep
    // rows (documents → PPM codec + banded phash self-join — the
    // bucket-collision fanout VERDICT-r10 flagged as never measured)
    "index_persist_build", "bm25_probe_persisted", "trgm_probe_persisted",
    "index_ivm_merge", "quantile_bins_approx", "mm_phash", "mm_dedup_phash",
    "mm_dedup_phash_canonical",
    // round-11 second wave: the seventh streaming gate (documents-
    // backed dictionary maintenance — vocabulary-bounded state over a
    // corpus-sized token stream)
    "stream_index_dict",
    // round-11 third wave: audio fingerprint + canonical audio dedup
    // (documents → chirp WAVs through the real codec)
    "mm_audio_hash", "mm_dedup_audio_canonical",
    // round-12 wave: postings-segment merge + probe (documents — the
    // expensive leg of a real segment merge, init+refresh+probe priced
    // per round via withTempTable like index_ivm_merge); incremental
    // containment admission (documents — batch probes vs persisted
    // base segments, base never shuffles after init)
    "bm25_probe_merged", "dedup_containment_incremental",
    // round-12 second wave: the persisted ANN lifecycle (embeddings) —
    // build priced with a reset per round (the index_persist_build
    // discipline), probes priced warm (the deployment steady state);
    // sim_ivf_probe_persisted pairs with the already-swept
    // sim_ivf_fullprobe to measure what persisting the quantizer is
    // worth on the vector side
    "ann_index_build", "sim_ivf_probe_persisted", "sim_ivf_probe_recall",
    "sim_ivfpq_probe_recall",
    // round-12 third wave: the perceptual-hash invariance plants
    // (documents → real codec edits, scan-bound: two decode+hash
    // passes over corpus/10 plants, one k-sized join)
    "mm_phash_shift_recall", "mm_audio_gain_recall",
    // round-12 fourth wave: the ANN lifecycle's incremental-refresh
    // leg (embeddings — init+refresh+probe priced per round via
    // withTempTable, the bm25_probe_merged discipline) and the video
    // family (documents → y4m through the real codec: decode-bound
    // meta/hash scans, per-video windowed cut detection, canonical
    // class dedup over keyframe hashes)
    "ann_ivm_merge", "sim_ivf_probe_merged",
    "mm_video_meta", "mm_video_frame_hash", "mm_video_scenecut",
    "mm_dedup_video_canonical",
    // round-12 fifth wave: the eighth streaming gate (embeddings —
    // nlist-bounded FMGWS state under a corpus-sized vector stream)
    "stream_ann_assign",
    // round-12 sixth wave: the video invariance plant (documents —
    // two decode+hash passes over corpus/10 plants, one frame-keyed
    // join). sim_ivfpq_probe_merged is deliberately NOT swept: its
    // build leg is byte-identical to sim_ivf_probe_merged's (already
    // swept) and the ADC delta is probe-side constant.
    "mm_video_shift_recall",
    // round-12 seventh wave: the ANN delete leg (embeddings — warm
    // probe minus a cell-co-keyed tombstone anti-join, both sides
    // pruned to the probed cells)
    "ann_probe_tombstoned",
    // round-12 eighth wave: the text delete leg (documents — warm
    // postings masked by a tombstone anti-join, stats header
    // corrected by the parked (count, sum_dl) of the delete batch)
    "bm25_probe_tombstoned",
    // round-12 ninth wave: compaction — merge-with-deletes on both
    // lifecycles (documents / embeddings), the whole cycle priced per
    // round (init + refresh + delete + compact + probe)
    "index_compact", "ann_compact",
    // round-13 wave: the refresh/compaction legs priced ALONE against
    // the memoized split segments (VERDICT-r12 item 6 — the
    // steady-state cost the whole-cycle gates could only argue); the
    // compressed-path delete (embeddings); the trigram segment's
    // merge/delete legs (documents)
    "bm25_probe_refresh", "index_compact_warm",
    "ann_probe_refresh", "ann_compact_warm",
    "ann_pq_probe_tombstoned",
    "trgm_probe_merged", "trgm_probe_tombstoned",
    // round-13 second wave: the continuous-indexing gates — streamed
    // ingest into servable delta segments on both lifecycles, plus the
    // occupancy-threshold retrain verdict (the stats' first consumer)
    "stream_index_ingest", "stream_ann_ingest", "stream_ann_retrain",
    // round-13 third wave: the trigram lifecycle's compact + stream
    // legs, completing the 3-lifecycle × 6-leg matrix
    "trgm_compact", "stream_trgm_ingest",
    // round-13 fourth wave: the warm-serving HYBRID probes (documents
    // + embeddings, both legs off warm segments — expected near-flat
    // like their per-leg parents) and the retrain decision loop
    // (embeddings — whole-cycle priced: frozen-quantizer assignment +
    // retrain + full re-encode + brute-force reconciliation per run)
    "rrf_probe_persisted", "rrf_probe_merged", "rrf_probe_production",
    "ann_retrain_apply",
    // round-13 fifth wave: epoch-manifest time travel on both index
    // lifecycles (documents / embeddings — two warm pruned probes per
    // entry plus a metadata-sized manifest write; expected near-flat)
    "bm25_probe_asof", "ann_probe_asof",
    // r14: trigram time travel now reads the memoized warm split
    // store (previously whole-cycle priced — the 6.7× decade row)
    "trgm_probe_asof",
    // round-14 wave: the trigram steady-state legs priced alone
    // against the new warm split store (documents); the fused delete
    // leg (documents + embeddings, both warm indexes masked); the
    // retrain-as-epoch commit (embeddings — whole-cycle priced:
    // frozen encode + verdict + retrain + full re-encode + 3 probes);
    // the composed multimodal release (documents → all three real
    // codecs + text near-dup dedup in one plan)
    "trgm_probe_refresh", "trgm_compact_warm",
    "rrf_probe_tombstoned", "ann_retrain_epoch", "mm_release_e2e",
    // the fused answer at a pinned snapshot vector (one epoch per
    // lifecycle) — two warm fused probes + a metadata-sized manifest
    "rrf_probe_asof")
  // fk_violations is EXCLUDED: it joins customer/part, which MkScale
  // does not scale - a sweep would measure a mixed-scale plan.
  // pareto_frontier is excluded for the same reason (part-backed);
  // its cost is bounded by the size domain anyway (<=50 points).

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val big = args.lift(1).getOrElse("/tmp/sf1")
    // optional 3rd+ args: sweep only these queries (chunked runs that
    // fit a CI/tool time budget; results are per-query JSON lines
    // either way, so chunks concatenate)
    val names = if (args.length > 2) args.drop(2).toSeq else tail
    names.foreach(n => require(tail.contains(n), s"not in the tail: $n"))
    val spark = GraftSession.tuned(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // SPARK_GRAFT_SWEEP_ROUNDS=1 for the deliberately-quadratic fenced
    // baselines at big SFs (a single timed round after warm-up — the
    // divergence being documented is orders of magnitude, not noise)
    val rounds =
      sys.env.getOrElse("SPARK_GRAFT_SWEEP_ROUNDS", "3").toInt
    def minOf3(name: String, dir: String): Double = {
      val fn = Registry.queryMap(name)
      // graph_edges prices the edge DERIVATION: reset the per-JVM
      // cache each round, or every round after the first would time a
      // warm parquet re-read. The other graph queries deliberately
      // keep the warm cache — they price their algorithm over the
      // materialized lifecycle table, which is the production split.
      def reset(): Unit = {
        if (name == "graph_edges") operators.GraphOps.resetEdgeCache()
        // same discipline for the text-index lifecycle: the build
        // query prices the derivation; the probe queries keep the
        // warm segments (the deployment steady state they model)
        if (name == "index_persist_build")
          operators.IndexOps.resetIndexCache()
        if (name == "ann_index_build")
          operators.AnnIndex.resetIndexCache()
        // ADVICE-r14 / VERDICT-r14 item 8: the r14 standing state
        // (containment segments, bucketed catalog tables, graph IVM
        // state) also needs a cold-pricing hook. Default sweep rounds
        // keep them warm (the refresh/steady-state split those gates
        // deliberately price — the graph_ivm_edges precedent);
        // SPARK_GRAFT_SWEEP_COLD=1 forces the build leg back into the
        // timed round for exactly these gates, so the derivations
        // stay priceable by a harness.
        if (sys.env.get("SPARK_GRAFT_SWEEP_COLD").contains("1")) {
          if (name == "dedup_containment_incremental" ||
              name == "bucketed_join")
            queries.Pipeline.resetStandingState(spark)
          if (name == "graph_ivm_edges")
            operators.GraphOps.resetEdgeCache()
        }
      }
      reset()
      Registry.force(fn(spark, dir)) // warm-up: listing, footers, codegen
      (1 to rounds).map { _ =>
        reset()
        val t0 = System.nanoTime()
        Registry.force(fn(spark, dir)) // full materialization, not count()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    // VERDICT-r11 item 6: raw artifacts must self-describe their
    // fixture pair — the old generic t_sf01/t_sf1 keys mislabeled
    // sf1→sf10 runs. A header line pins the fixtures once; every row
    // carries fixture-neutral t_lo/t_hi keys.
    println(s"""{"sweep_fixtures":{"lo":"$base","hi":"$big"},"rounds":$rounds}""")
    val rows = names.flatMap { name =>
      try {
        val tb = minOf3(name, base)
        val ts = minOf3(name, big)
        println(f"""{"query":"$name","t_lo":$tb%.3f,"t_hi":$ts%.3f,"ratio":${ts / tb}%.2f}""")
        Some((name, tb, ts, ts / tb))
      } catch {
        case e: Throwable =>
          println(s"""{"query":"$name","error":"${e.getClass.getSimpleName}"}""")
          None
      }
    }
    println(s"\n| query | lo=$base s | hi=$big s | ratio (10x data) |")
    println("|---|---|---|---|")
    rows.sortBy(-_._4).foreach { case (n, tb, ts, r) =>
      println(f"| $n | $tb%.2f | $ts%.2f | $r%.2f |")
    }
    spark.stop()
  }
}
