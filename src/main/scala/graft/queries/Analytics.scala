package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{GQuery, Tables => T}
import graft.operators.Pack

/** Round-8 corpus/product analytics wave: deterministic weighted
  * sampling, n-gram frequency, vocabulary coverage, label-balance
  * impurity, and ordered funnel matching — the remaining everyday
  * shapes between the prep operators (chunk/pack/mix) and the
  * retrieval/graph families.
  *
  * House determinism rules throughout: exact integers across every
  * aggregate boundary (DECIMAL/HUGEINT where products can pass 2^63 —
  * the drift_chi2 lesson), integer DIV on both engines, one double
  * division at the end `round`ed to 6, fully ordered outputs with
  * total tie-break orders.
  */
object Analytics {

  /** Deterministic SYSTEMATIC weighted sampling — the seed-free,
    * shuffle-free analogue of weighted reservoir sampling: lay every
    * document's weight (n_chars) on a line in doc_id order, walk it
    * with stride = total_weight DIV 100, and pick the document under
    * each stride mark. Inclusion count = number of marks inside the
    * doc's interval = (cb+wt) DIV step − cb DIV step — exactly
    * proportional to weight (±1 mark), every arithmetic step integral
    * on both engines. The global position comes from
    * [[Pack.withGlobalPrefixSum]] (range partition → per-partition
    * window + 32-entry offset map), NEVER a partition-less window —
    * at 100 TB the only global structure is the 32-long totals array
    * on the driver; selection itself is a map-side filter emitting
    * ~100 rows. Weighted sampling via exponential/ln keys is avoided
    * deliberately: libm ln is not correctly-rounded and would break
    * the cross-engine hash (the znorm/χ² precedent). */
  val sample_weighted = GQuery(
    "sample_weighted",
    (s, d) => {
      import s.implicits._
      val docs = T.documents(s, d)
        .select($"doc_id", $"n_chars".cast("long").as("wt"))
      val ps = Pack.withGlobalPrefixSum(docs, "doc_id", "wt", "cb")
      val tot = docs.agg(sum($"wt").as("tot"))
      ps.crossJoin(broadcast(tot))
        .withColumn("step", expr("greatest(tot DIV 100, CAST(1 AS BIGINT))"))
        .withColumn("n_picks", expr("(cb + wt) DIV step - cb DIV step"))
        .filter($"n_picks" > 0L)
        .select($"doc_id", $"wt", $"cb", $"n_picks")
        .orderBy($"doc_id")
    },
    Some("""
      WITH w AS (
        SELECT doc_id, CAST(n_chars AS BIGINT) AS wt,
               CAST(SUM(CAST(n_chars AS BIGINT)) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - CAST(n_chars AS BIGINT) AS BIGINT) AS cb
        FROM documents),
      t AS (SELECT GREATEST(CAST(SUM(n_chars) AS BIGINT) // 100,
                            CAST(1 AS BIGINT)) AS step
            FROM documents)
      SELECT doc_id, wt, cb,
             CAST((cb + wt) // step - cb // step AS BIGINT) AS n_picks
      FROM w, t
      WHERE (cb + wt) // step - cb // step > 0
      ORDER BY doc_id"""))

  /** Corpus bigram frequency, top 20 under the total tie-break order
    * (count DESC, bigram ASC) — the n-gram statistics pass a tokenizer
    * or LM-data audit runs. One generator explode (no shuffle), one
    * keyed count with map-side partials, and the limit plans as
    * TakeOrderedAndProject — per-partition top-20 heaps, 20 rows per
    * task to the driver, never a global sort. Tokenization is the
    * repo-canonical single-space split (the dedup shingle spelling),
    * and docs under 2 tokens are filtered BEFORE the 0..size−2
    * sequence so it can never go negative (Spark sequence throws on a
    * negative stop where generate_series returns empty). */
  val ngram_topk = GQuery(
    "ngram_topk",
    (s, d) => {
      import s.implicits._
      T.documents(s, d)
        .select(split($"text", " ").as("t"))
        .filter(size($"t") >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(t) - 2)," +
            " i -> t[i] || ' ' || t[i + 1])")).as("bigram"))
        .groupBy($"bigram")
        .agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"bigram")
        .limit(20)
    },
    Some("""
      WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
      b AS (
        SELECT t[i] || ' ' || t[i + 1] AS bigram
        FROM toks, LATERAL (SELECT UNNEST(range(1, len(t))) AS i) u
        WHERE len(t) >= 2)
      SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
      FROM b GROUP BY bigram
      ORDER BY n DESC, bigram LIMIT 20"""))

  /** Token coverage of a size-1000 frequency vocabulary — the
    * tokenizer-budget question ("what fraction of the token stream
    * does a top-V vocab absorb?"). The cutoff is the same total order
    * as [[ngram_topk]] (count DESC, token ASC), so the vocab SET is
    * deterministic under ties; coverage needs no second corpus pass —
    * covered = Σ counts of the vocab rows, total = Σ all counts, both
    * exact longs off the one token-count aggregate. At 100 TB: one
    * explode + one keyed count (the only shuffle), a 1000-row
    * TakeOrdered, two scalar aggregates. */
  val vocab_coverage = GQuery(
    "vocab_coverage",
    (s, d) => {
      import s.implicits._
      val counts = T.documents(s, d)
        .select(explode(split($"text", " ")).as("token"))
        .groupBy($"token").agg(count(lit(1)).as("n"))
      val vocab = counts.orderBy($"n".desc, $"token").limit(1000)
      val tot = counts.agg(sum($"n").as("total_tokens"))
      val cov = vocab.agg(count(lit(1)).as("vocab_size"),
        sum($"n").as("covered_tokens"))
      cov.crossJoin(broadcast(tot))
        .select($"vocab_size", $"total_tokens", $"covered_tokens",
          round($"covered_tokens".cast("double") /
            $"total_tokens".cast("double"), 6).as("coverage"))
    },
    Some("""
      WITH tk AS (
        SELECT UNNEST(string_split(text, ' ')) AS token FROM documents),
      c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n
            FROM tk GROUP BY 1),
      v AS (SELECT token, n FROM c ORDER BY n DESC, token LIMIT 1000)
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS vocab_size,
             (SELECT CAST(SUM(n) AS BIGINT) FROM c) AS total_tokens,
             (SELECT CAST(SUM(n) AS BIGINT) FROM v) AS covered_tokens,
             ROUND(CAST((SELECT SUM(n) FROM v) AS DOUBLE) /
                   CAST((SELECT SUM(n) FROM c) AS DOUBLE), 6)
               AS coverage"""))

  /** Top-15 bigram collocations by pointwise mutual information — the
    * "which word pairs co-occur more than chance" pass of corpus
    * linguistics / tokenizer design. PMI = log p(x,y)/(p(x)p(y)) is
    * ranked WITHOUT ever computing the log: log is monotone, so
    * ordering by the exact rational lift (c_xy·N)/(c_x·c_y) is the
    * same order — and the gated score is that lift in exact integer
    * micro-units, `(c_xy·N·10⁶) DIV (c_x·c_y)`, widened to
    * DECIMAL(38,0)/HUGEINT before the products (the corr_matrix
    * discipline) so both engines hash identically (ln is NOT gateable
    * across libms; rationals are). With the min-support filter
    * c_xy ≥ 5, lift_micro ≤ 10⁶·N/max(c_x,c_y) ≤ 2·10⁵·N — BIGINT-
    * safe past 4·10¹³ tokens (≳100 TB of text). Shape at scale: ONE
    * corpus pass — each token occurrence generates a single
    * (token, next-or-NULL) struct, so one vocab²-bounded (a,b) count
    * yields the bigram table directly and the unigram counts by
    * summing over b (PERF.md rescue #5; the separate-aggregate
    * spelling replanned the unigram subplan per reference and scanned
    * the corpus 4×). The count is lineage-cut, the support filter
    * shrinks the bigram table BEFORE its two vocabulary-keyed joins,
    * the 1-row token total broadcasts back, and the top-15 plans as
    * TakeOrderedAndProject under the (lift DESC, a, b) total
    * tie-break — never a global sort. Tokenization is the
    * repo-canonical single-space split shared with [[ngram_topk]]. */
  val collocations_pmi = GQuery(
    "collocations_pmi",
    (s, d) => {
      import s.implicits._
      val toksDf = T.documents(s, d).select(split($"text", " ").as("t"))
      // ONE corpus pass feeds everything: each token occurrence
      // generates exactly one (token, next-token-or-NULL) struct, so
      // the single (a, b)-keyed count — vocab²-bounded — yields the
      // bigram table directly AND the unigram counts by summing over
      // b (every occurrence is `a` exactly once). The naive spelling
      // (separate unigram + bigram aggregates, unigram referenced by
      // both joins and the total) replans per reference and scans the
      // corpus 4×. The lineage cut pins the sharing; the cut state is
      // vocabulary-squared-bounded, never corpus-sized. The i-indexed
      // transform stays in bounds by construction (t[i-1] for
      // i ∈ 1..|t|; the CASE guards t[i]) — no sequence(0, -1)
      // downward hazard on 1-token docs.
      val counts = toksDf.filter(size($"t") >= 1)
        .select(explode(expr(
          "transform(sequence(1, size(t))," +
            " i -> struct(t[i - 1] AS a," +
            " CASE WHEN i < size(t) THEN t[i] ELSE NULL END AS b))"))
          .as("p"))
        .groupBy($"p.a".as("a"), $"p.b".as("b"))
        .agg(count(lit(1)).as("c"))
        // vocab²-bounded: collapse to one partition before the cut so
        // the materialization is one task, not 32 near-empty ones
        .coalesce(1)
        .localCheckpoint()
      val uni = counts.groupBy($"a").agg(sum($"c").as("c"))
        .select($"a".as("tok"), $"c")
      val tot = uni.agg(sum($"c").as("n_tokens"))
      val bi = counts.filter($"b".isNotNull)
        .select($"a", $"b", $"c".as("c_xy"))
        .filter($"c_xy" >= 5)
      bi.join(uni.select($"tok".as("a"), $"c".as("c_a")), "a")
        .join(uni.select($"tok".as("b"), $"c".as("c_b")), "b")
        .crossJoin(broadcast(tot))
        .select($"a", $"b", $"c_xy", $"c_a", $"c_b",
          expr("""CAST((CAST(c_xy AS DECIMAL(38,0))
                        * CAST(n_tokens AS DECIMAL(38,0)) * 1000000)
                       DIV (CAST(c_a AS DECIMAL(38,0))
                            * CAST(c_b AS DECIMAL(38,0)))
                  AS BIGINT)""").as("lift_micro"))
        .orderBy($"lift_micro".desc, $"a", $"b")
        .limit(15)
    },
    Some("""
      WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
      u AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
      n AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tokens FROM u),
      bg AS (
        SELECT t[i] AS a, t[i + 1] AS b, CAST(COUNT(*) AS BIGINT) AS c_xy
        FROM toks, LATERAL (SELECT UNNEST(range(1, len(t))) AS i) ix
        WHERE len(t) >= 2
        GROUP BY 1, 2 HAVING COUNT(*) >= 5)
      SELECT bg.a, bg.b, c_xy, ua.c AS c_a, ub.c AS c_b,
             CAST((CAST(c_xy AS HUGEINT) * n_tokens * 1000000)
                  // (CAST(ua.c AS HUGEINT) * ub.c) AS BIGINT)
               AS lift_micro
      FROM bg JOIN u ua ON bg.a = ua.tok
              JOIN u ub ON bg.b = ub.tok, n
      ORDER BY lift_micro DESC, a, b LIMIT 15"""))

  /** BPE tokenizer-vocabulary induction — 5 byte-pair-merge rounds,
    * the algorithm every LLM tokenizer is trained with. This is the
    * SCALABLE BPE shape: ONE corpus pass builds the word-frequency
    * histogram (the only data-sized stage), and every merge round
    * runs over the DISTINCT-WORD DICTIONARY weighted by frequency —
    * bounded by vocabulary, not corpus, so 5 rounds cost 5 tiny
    * keyed aggregates no matter the corpus size. Each round: adjacent
    * symbol pairs from the current tokenization, weighted count,
    * argmax under the (count DESC, lhs, rhs) total tie-break (a 1-row
    * TakeOrderedAndProject broadcast back), then the merge applied to
    * the dictionary state.
    *
    * The tokenization state is a SENTINEL-WRAPPED STRING — every
    * symbol spelled `#sym#` and concatenated — so applying a merge is
    * one codegen'd `replace(wr, '#a##b#', '#ab#')`: wrapped symbols
    * share no boundary characters, making string replace's leftmost
    * non-overlapping semantics EXACTLY greedy BPE (an array-rebuild
    * via higher-order lambdas would be CodegenFallback — the
    * phrase_query lesson). Both engines run the same string algebra;
    * '#' cannot collide BY CONSTRUCTION — tokens containing the
    * sentinel are filtered out of the vocabulary in both engines
    * (ADVICE-r9), not merely assumed absent.
    * `n_merged` is the standard pre-merge adjacent-pair count (for a
    * self-pair like (a,a) over "aaa" it counts overlaps the greedy
    * replace won't all rewrite — the textbook BPE statistic, same on
    * both engines); `symbols_after` is recomputed FROM the post-merge
    * state on each engine independently, so any replace-semantics
    * divergence flips the hash even where n_merged agrees. Rounds are
    * lineage-cut (the pagerank discipline): eager localCheckpoints
    * keep round k from replanning rounds 1..k−1, and the corpus scan
    * happens exactly once. The oracle is a GENERATED 5-deep unrolled
    * CTE chain of the same recurrence. */
  private val bpeSteps = 5

  /** The BPE merge loop shared by [[bpe_train]] and [[bpe_encode]]:
    * word histogram (the one corpus pass) → `bpeSteps` greedy merge
    * rounds over the dictionary. Returns the final dictionary state
    * (w, wr, n) and the per-step 1-row merge frames. Rounds are
    * lineage-cut so round k never replans rounds 1..k−1. */
  private def bpeMergeLoop(s: org.apache.spark.sql.SparkSession,
      d: String): (org.apache.spark.sql.DataFrame,
      Seq[org.apache.spark.sql.DataFrame]) = {
    import s.implicits._
    // ADVICE-r9: the sentinel algebra is only sound for tokens free
    // of '#', and the corpus being lowercase words was previously just
    // a comment. Enforce it structurally: tokens containing the
    // sentinel are excluded from the vocabulary in BOTH engines (one
    // predicate on the vocabulary-sized histogram; bpe_encode's inner
    // join then drops the same tokens from the corpus stream on both
    // sides), so a '#'-bearing corpus degrades identically instead of
    // silently corrupting the merge algebra.
    val hist = T.documents(s, d)
      .select(explode(split($"text", " ")).as("w"))
      .filter(!$"w".contains("#"))
      .groupBy($"w").agg(count(lit(1)).as("n"))
    var state = hist
      .select($"w", regexp_replace($"w", "(.)", "#$1#").as("wr"), $"n")
      .localCheckpoint()
    val rows = (1 to bpeSteps).map { step =>
      val toksd = state.select(
        split(expr("substring(wr, 2, length(wr) - 2)"), "##").as("t"),
        $"n")
      val win = toksd.filter(size($"t") >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(t) - 2)," +
            " i -> struct(t[i] AS a, t[i + 1] AS b))")).as("p"), $"n")
        .select($"p.a".as("lhs"), $"p.b".as("rhs"), $"n")
        .groupBy($"lhs", $"rhs").agg(sum($"n").as("n_merged"))
        .orderBy($"n_merged".desc, $"lhs", $"rhs").limit(1)
        .localCheckpoint()
      state = state.crossJoin(broadcast(win))
        .select($"w", expr(
          "replace(wr, '#' || lhs || '##' || rhs || '#'," +
            " '#' || lhs || rhs || '#')").as("wr"), $"n")
        .localCheckpoint()
      val after = state.agg(
        sum($"n" * size(split(
          expr("substring(wr, 2, length(wr) - 2)"), "##")))
          .as("symbols_after"))
      win.crossJoin(broadcast(after))
        .select(lit(step).as("step"), $"lhs", $"rhs",
          $"n_merged", $"symbols_after")
    }
    (state, rows)
  }

  /** The generated WITH-chain both BPE oracles share: histogram, s0,
    * then (pairs → argmax → merged state) per round, states carrying
    * the original word `w` through every round. */
  private def bpeOracleChain: String = {
    val rounds = (1 to bpeSteps).map { k =>
      s"""t$k AS (
        SELECT string_split(substr(wr, 2, length(wr) - 2), '##')
                 AS t, n
        FROM s${k - 1}),
      m$k AS (
        SELECT t[i] AS lhs, t[i + 1] AS rhs,
               CAST(SUM(n) AS BIGINT) AS n_merged
        FROM t$k, LATERAL (SELECT UNNEST(range(1, len(t))) AS i) ix
        WHERE len(t) >= 2
        GROUP BY 1, 2 ORDER BY n_merged DESC, lhs, rhs LIMIT 1),
      s$k AS (
        SELECT w, replace(wr, '#' || lhs || '##' || rhs || '#',
                       '#' || lhs || rhs || '#') AS wr, n
        FROM s${k - 1}, m$k)"""
    }.mkString(",\n      ")
    s"""WITH h AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS w
              FROM documents)
        WHERE w NOT LIKE '%#%'
        GROUP BY w),
      s0 AS (
        SELECT w, regexp_replace(w, '(.)', '#\\1#', 'g') AS wr, n
        FROM h),
      $rounds"""
  }

  val bpe_train: GQuery =
    GQuery(
      "bpe_train",
      (s, d) => {
        import s.implicits._
        val (_, rows) = bpeMergeLoop(s, d)
        rows.reduce(_ unionByName _).orderBy($"step")
      },
      Some {
        val selects = (1 to bpeSteps).map { k =>
          s"""SELECT $k AS step, lhs, rhs, n_merged,
            (SELECT CAST(SUM(n * len(string_split(
                       substr(wr, 2, length(wr) - 2), '##'))) AS BIGINT)
             FROM s$k) AS symbols_after
          FROM m$k"""
        }.mkString("\n          UNION ALL\n          ")
        s"""
          $bpeOracleChain
          $selects
          ORDER BY step"""
      })

  /** BPE ENCODING — apply the learned merges back to the corpus and
    * gate per-document token counts (whitespace vs BPE), i.e. "token
    * counting with a BPE tokenizer", the number every training-data
    * budget is denominated in. The scalable encode NEVER re-tokenizes
    * document text: the merge loop already produced the dictionary's
    * final tokenization, so encoding is `n_tok(word)` computed once
    * per DISTINCT word and BROADCAST-joined onto the corpus token
    * stream — the corpus pays one explode + one broadcast hash join +
    * one doc-keyed aggregate with map-side partials, and the merge
    * machinery stays vocabulary-bounded. The oracle re-derives the
    * same 5 merges through the generated CTE chain and joins the
    * word→token-count map the textbook way. `n_bpe_tokens ≤
    * n_ws_tokens · max-word-length` and ≥ n_ws_tokens by
    * construction; both counts are exact longs in the gate. */
  val bpe_encode: GQuery =
    GQuery(
      "bpe_encode",
      (s, d) => {
        import s.implicits._
        val (state, _) = bpeMergeLoop(s, d)
        val ntok = state.select($"w",
          size(split(expr("substring(wr, 2, length(wr) - 2)"), "##"))
            .cast("long").as("n_tok"))
        T.documents(s, d)
          .select($"doc_id", explode(split($"text", " ")).as("w"))
          .join(broadcast(ntok), "w")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_ws_tokens"),
            sum($"n_tok").as("n_bpe_tokens"))
          .orderBy($"doc_id")
      },
      Some(s"""
        $bpeOracleChain,
        nt AS (
          SELECT w, CAST(len(string_split(
                   substr(wr, 2, length(wr) - 2), '##')) AS BIGINT)
                   AS n_tok
          FROM s$bpeSteps),
        dw AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM documents)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_ws_tokens,
               CAST(SUM(n_tok) AS BIGINT) AS n_bpe_tokens
        FROM dw JOIN nt USING (w)
        GROUP BY doc_id ORDER BY doc_id"""))

  /** Robust outlier report per event type — median absolute deviation,
    * the quality-filtering statistic that survives the heavy tails
    * that break mean/σ (znorm's diagnostic complement; winsorize clips
    * by rank, this COUNTS by robust distance). Exactness discipline:
    * values are quantized to integer micro-units FIRST
    * (floor(v·10⁶ + 0.5), the house tie rule), so both engines take
    * medians of integers — an interpolated median of two ints is an
    * exact .5 in double no matter how the engine spells the
    * interpolation, where a raw-double median could differ in the last
    * ulp between formulas. The outlier predicate |x − med| > 3·MAD
    * compares exact-integer-valued doubles, so counts hash-gate.
    * Shape: two keyed SORT-based exact-percentile aggregates over the
    * (type, value) stream with the 64-key median table broadcast back
    * between them, then one counting aggregate — the event stream
    * shuffles on event_type only, and percentile state is per-group.
    * (At 100 TB the drop-in scale path is percentile_approx — the
    * winsorize_clip/winsorize_approx fence precedent, pair-priced
    * there; this gate pins the exact semantics.) */
  val outliers_mad = GQuery(
    "outliers_mad",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
        .select($"event_type",
          floor($"value" * 1000000d + 0.5d).as("vm"))
      val med = ev.groupBy($"event_type")
        .agg(expr("percentile(vm, 0.5D)").as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("adev", abs($"vm" - $"med"))
      val mad = dev.groupBy($"event_type")
        .agg(expr("percentile(adev, 0.5D)").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          first($"med").as("median_micro"),
          first($"mad").as("mad_micro"),
          sum(when($"adev" > lit(3d) * $"mad", 1L).otherwise(0L))
            .as("n_outliers"),
          max($"adev").as("max_abs_dev"))
        .orderBy($"event_type")
    },
    Some("""
      WITH ev AS (
        SELECT event_type,
               FLOOR(value * 1000000 + 0.5) AS vm
        FROM events),
      med AS (
        SELECT event_type, quantile_cont(vm, 0.5) AS med
        FROM ev GROUP BY event_type),
      dev AS (
        SELECT ev.event_type, ABS(ev.vm - med.med) AS adev, med.med
        FROM ev JOIN med USING (event_type)),
      mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY event_type)
      SELECT dev.event_type, CAST(COUNT(*) AS BIGINT) AS n,
             ANY_VALUE(dev.med) AS median_micro,
             ANY_VALUE(mad.mad) AS mad_micro,
             CAST(SUM(CASE WHEN dev.adev > 3 * mad.mad THEN 1 ELSE 0
                      END) AS BIGINT) AS n_outliers,
             MAX(dev.adev) AS max_abs_dev
      FROM dev JOIN mad USING (event_type)
      GROUP BY dev.event_type ORDER BY dev.event_type"""))

  /** Label-balance report: per language, the Gini impurity of its
    * source distribution (1 − Σc²/n²) — the class-balance check a
    * mixture designer runs before weighting (mix_temperature's
    * diagnostic sibling). Entropy is avoided deliberately (ln is not
    * correctly-rounded cross-engine); Gini is rational, so numerator
    * and denominator are EXACT integers — widened to DECIMAL/HUGEINT
    * before any product (c² and n² pass 2^63 at 100 TB row counts,
    * the drift_chi2 lesson) — with one correctly-rounded double
    * division at the end. Two nested keyed aggregates, both
    * map-side-combinable; output is label-domain-sized. */
  val label_gini = GQuery(
    "label_gini",
    (s, d) => {
      import s.implicits._
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val c = T.documents(s, d)
        .groupBy($"lang", $"source").agg(count(lit(1)).as("c"))
      c.groupBy($"lang")
        .agg(sum($"c").as("n"), count(lit(1)).as("n_sources"),
          sum(dec($"c") * dec($"c")).as("s2"))
        .select($"lang", $"n", $"n_sources",
          round((dec($"n") * dec($"n") - $"s2").cast("double") /
            (dec($"n") * dec($"n")).cast("double"), 6).as("gini"))
        .orderBy($"lang")
    },
    Some("""
      WITH c AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2),
      g AS (
        SELECT lang, CAST(SUM(c) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_sources,
               SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS s2
        FROM c GROUP BY 1)
      SELECT lang, n, n_sources,
             ROUND(CAST(CAST(n AS HUGEINT) * CAST(n AS HUGEINT) - s2
                     AS DOUBLE) /
                   CAST(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)
                     AS DOUBLE), 6) AS gini
      FROM g ORDER BY lang"""))

  /** Ordered funnel matching over the event stream: per user, the
    * first signup, then the first view AT OR AFTER it, then the first
    * purchase at or after that — sequential pattern matching as three
    * keyed min-aggregates + user-keyed joins, no window over the raw
    * stream and no per-user event sort. "First" is the min of the
    * (us, event_id) struct — the repo's total event order — and the
    * at-or-after comparison is spelled explicitly ((us > p_us) OR
    * (us = p_us AND event_id >= p_id)) so both engines share the
    * boundary rule at µs ties. Users with no signup are out of the
    * funnel by definition; later steps left-join so a stalled funnel
    * shows its NULLs and `steps_reached` counts them. At 100 TB each
    * step is one filtered scan + map-side-combinable min per user;
    * the joins are user-keyed (AQE broadcasts the shrinking step
    * tables). */
  val funnel_steps = GQuery(
    "funnel_steps",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d).select($"user_id", $"event_type",
        $"event_id", unix_micros($"ts".cast("timestamp")).as("us"))
      def after(us: org.apache.spark.sql.Column,
          id: org.apache.spark.sql.Column,
          pUs: org.apache.spark.sql.Column,
          pId: org.apache.spark.sql.Column) =
        us > pUs || (us === pUs && id >= pId)
      val s1 = ev.filter($"event_type" === "signup").groupBy($"user_id")
        .agg(min(struct($"us", $"event_id")).as("s1"))
      val s2 = ev.filter($"event_type" === "view")
        .join(s1, "user_id")
        .filter(after($"us", $"event_id", $"s1.us", $"s1.event_id"))
        .groupBy($"user_id")
        .agg(min(struct($"us", $"event_id")).as("s2"))
      val s3 = ev.filter($"event_type" === "purchase")
        .join(s2, "user_id")
        .filter(after($"us", $"event_id", $"s2.us", $"s2.event_id"))
        .groupBy($"user_id")
        .agg(min(struct($"us", $"event_id")).as("s3"))
      s1.join(s2, Seq("user_id"), "left")
        .join(s3, Seq("user_id"), "left")
        .select($"user_id",
          $"s1.us".as("signup_us"),
          $"s2.us".as("view_us"),
          $"s3.us".as("purchase_us"),
          (lit(1L) + when($"s2".isNotNull, 1L).otherwise(0L)
            + when($"s3".isNotNull, 1L).otherwise(0L))
            .as("steps_reached"))
        .orderBy($"user_id")
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_type, event_id, epoch_us(ts) AS us
        FROM events),
      s1 AS (
        SELECT user_id, us AS s1_us, event_id AS s1_id FROM (
          SELECT user_id, us, event_id,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY us, event_id) AS rn
          FROM e WHERE event_type = 'signup') WHERE rn = 1),
      s2 AS (
        SELECT user_id, us AS s2_us, event_id AS s2_id FROM (
          SELECT e.user_id, e.us, e.event_id,
                 ROW_NUMBER() OVER (PARTITION BY e.user_id
                                    ORDER BY e.us, e.event_id) AS rn
          FROM e JOIN s1 ON e.user_id = s1.user_id
          WHERE e.event_type = 'view'
            AND (e.us > s1.s1_us
                 OR (e.us = s1.s1_us AND e.event_id >= s1.s1_id)))
        WHERE rn = 1),
      s3 AS (
        SELECT user_id, us AS s3_us, event_id AS s3_id FROM (
          SELECT e.user_id, e.us, e.event_id,
                 ROW_NUMBER() OVER (PARTITION BY e.user_id
                                    ORDER BY e.us, e.event_id) AS rn
          FROM e JOIN s2 ON e.user_id = s2.user_id
          WHERE e.event_type = 'purchase'
            AND (e.us > s2.s2_us
                 OR (e.us = s2.s2_us AND e.event_id >= s2.s2_id)))
        WHERE rn = 1)
      SELECT s1.user_id, s1.s1_us AS signup_us, s2.s2_us AS view_us,
             s3.s3_us AS purchase_us,
             CAST(1 + (CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END)
                    + (CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1 END)
               AS BIGINT) AS steps_reached
      FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
              LEFT JOIN s3 ON s1.user_id = s3.user_id
      ORDER BY s1.user_id"""))

  /** Single-pass pairwise Pearson correlation over the four lineitem
    * measures — the feature-correlation screen every tabular training
    * pipeline runs before pruning redundant columns. Measures are
    * first made integral (quantity is integer-valued; price, discount
    * and tax go to cents under the floor(x·100 + 0.5) house tie rule —
    * the double multiply is the same IEEE op on both engines), then
    * ONE HashAggregate computes all 15 moments (n, 4 sums, 4 sums of
    * squares, 6 cross sums) as exact DECIMAL(38,0)/HUGEINT integers —
    * no Expand, no per-pair pass, map-side partials, scan-floor at any
    * SF. The 6 output rows are reshaped from the single moment row by
    * an explode-of-struct-array (1-row operation). Correlation
    * numerators/denominators stay exact until one final identical IEEE
    * tree: corr = (n·Σxy − ΣxΣy) / (√(n·Σx²−(Σx)²) · √(n·Σy²−(Σy)²))
    * — √ and / are correctly rounded per IEEE-754, so the doubles gate
    * exactly (the znorm precedent; ln-based stats could not). Product
    * bound: at 100 TB n ≈ 6·10¹¹ and Σxy ≤ 3·10²², so n·Σxy ≤ 1.8·10³⁴
    * < 10³⁸ — DECIMAL(38,0) never overflows. */
  val corr_matrix_exact = GQuery(
    "corr_matrix_exact",
    (s, d) => {
      import s.implicits._
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val vars = Seq("qty", "price_c", "disc_c", "tax_c")
      val m = T.lineitem(s, d).select(
        $"l_quantity".cast("long").as("qty"),
        expr("CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)")
          .as("price_c"),
        expr("CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)").as("disc_c"),
        expr("CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT)").as("tax_c"))
      val pairs = for {
        i <- vars.indices; j <- vars.indices if i < j
      } yield (vars(i), vars(j))
      val moments = m.agg(
        count(lit(1)).as("n"),
        (vars.map(v => sum(dec(col(v))).as(s"s_$v")) ++
          vars.map(v => sum(dec(col(v)) * dec(col(v))).as(s"ss_$v")) ++
          pairs.map { case (x, y) =>
            sum(dec(col(x)) * dec(col(y))).as(s"sp_${x}_$y") }): _*)
      val rows = moments.select($"n",
        explode(array(pairs.map { case (x, y) =>
          struct(lit(x).as("var_x"), lit(y).as("var_y"),
            col(s"s_$x").as("sx"), col(s"s_$y").as("sy"),
            col(s"ss_$x").as("sxx"), col(s"ss_$y").as("syy"),
            col(s"sp_${x}_$y").as("sxy"))
        }: _*)).as("p"))
      rows.select($"p.var_x", $"p.var_y", $"n",
          round($"p.sx".cast("double") / $"n".cast("double"), 6)
            .as("mean_x"),
          round($"p.sy".cast("double") / $"n".cast("double"), 6)
            .as("mean_y"),
          round((dec($"n") * $"p.sxy" - $"p.sx" * $"p.sy").cast("double") /
            (sqrt((dec($"n") * $"p.sxx" - $"p.sx" * $"p.sx")
              .cast("double")) *
             sqrt((dec($"n") * $"p.syy" - $"p.sy" * $"p.sy")
              .cast("double"))), 6).as("corr"))
        .orderBy($"var_x", $"var_y")
    },
    Some {
      val vars = Seq("qty", "price_c", "disc_c", "tax_c")
      val pairs = for {
        i <- vars.indices; j <- vars.indices if i < j
      } yield (vars(i), vars(j))
      val sums = (vars.map(v => s"SUM(CAST($v AS HUGEINT)) AS s_$v") ++
        vars.map(v =>
          s"SUM(CAST($v AS HUGEINT) * CAST($v AS HUGEINT)) AS ss_$v") ++
        pairs.map { case (x, y) =>
          s"SUM(CAST($x AS HUGEINT) * CAST($y AS HUGEINT)) AS sp_${x}_$y"
        }).mkString(",\n               ")
      val arms = pairs.map { case (x, y) =>
        s"""SELECT '$x' AS var_x, '$y' AS var_y, n,
             ROUND(CAST(s_$x AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_x,
             ROUND(CAST(s_$y AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_y,
             ROUND(CAST(CAST(n AS HUGEINT) * sp_${x}_$y - s_$x * s_$y
                     AS DOUBLE) /
                   (SQRT(CAST(CAST(n AS HUGEINT) * ss_$x - s_$x * s_$x
                     AS DOUBLE)) *
                    SQRT(CAST(CAST(n AS HUGEINT) * ss_$y - s_$y * s_$y
                     AS DOUBLE))), 6) AS corr
           FROM s"""
      }.mkString("\n      UNION ALL ")
      s"""
      WITH m AS (
        SELECT CAST(l_quantity AS BIGINT) AS qty,
               CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                 AS price_c,
               CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS disc_c,
               CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT) AS tax_c
        FROM lineitem),
      s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               $sums
        FROM m)
      SELECT * FROM ($arms) ORDER BY var_x, var_y"""
    })

  /** Sliding-window exact distinct counting: distinct users per day
    * and per trailing 7-day window — THE engagement metric (DAU/WAU),
    * and deliberately NOT a sum of daily counts (a user active on 3
    * days is one weekly user). The scalable composition: dedup to
    * user-day pairs first (one keyed aggregate; the raw stream is
    * touched once), then each user-day row is exploded into the ≤7
    * window-ends it can influence — BOUNDED fanout, versus the
    * day×window range self-join whose probe side grows with the
    * window length — and a two-phase count-distinct per window end
    * finishes it. Everything is integer epoch-day arithmetic
    * (us DIV 86400000000, the house integer-DIV rule). The oracle
    * takes the OTHER road on purpose — a day-range join over the same
    * user-day pairs — so the bounded-explode rewrite is verified
    * against the textbook spelling, not against itself. Trailing
    * windows at the front of the series are partial by definition;
    * window ends past the last active day are dropped by the join
    * with observed days. */
  val window_distinct_users = GQuery(
    "window_distinct_users",
    (s, d) => {
      import s.implicits._
      val ud = T.events(s, d)
        .select($"user_id",
          expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000")
            .as("day"))
        .distinct()
      val daily = ud.groupBy($"day")
        .agg(count(lit(1)).as("n_users_day"))
      val n7 = ud
        .select($"user_id",
          explode(sequence($"day", $"day" + 6L)).as("day"))
        .groupBy($"day")
        .agg(countDistinct($"user_id").as("n_users_7d"))
      daily.join(n7, Seq("day"))
        .select($"day", $"n_users_day", $"n_users_7d")
        .orderBy($"day")
    },
    Some("""
      WITH ud AS (
        SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        FROM events),
      days AS (SELECT DISTINCT day FROM ud),
      win AS (
        SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT)
                 AS n_users_7d
        FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
        GROUP BY d.day),
      daily AS (
        SELECT day, CAST(COUNT(*) AS BIGINT) AS n_users_day
        FROM ud GROUP BY day)
      SELECT day, n_users_day, n_users_7d
      FROM daily JOIN win USING (day) ORDER BY day"""))

  /** 2-D Pareto frontier (skyline): the price/size efficient frontier
    * of the part catalog — minimal retail price (integer cents, house
    * tie rule) for maximal size, the classic "best tradeoff" screen.
    * The scale shape exploits the low-cardinality dimension: ONE keyed
    * aggregate collapses the table to per-size minimum price (≤50
    * candidate points — bounded by the size domain, NOT by N), and
    * only that provably tiny set sees the frontier window (running
    * min of cents over strictly larger sizes); members are recovered
    * by a broadcast join back. A global window never touches a
    * full-size table. The gate carries its own certificate:
    * `dominated_in_frontier` counts dominance pairs WITHIN the emitted
    * frontier via the tiny self-join and must be 0 — and the oracle
    * derives the frontier by the textbook quadratic NOT EXISTS over
    * the candidate points, so the running-min rewrite is checked
    * against the definition of dominance, not against itself. */
  val pareto_frontier = GQuery(
    "pareto_frontier",
    (s, d) => {
      import s.implicits._
      val cand = T.part(s, d)
        .select($"p_size".cast("long").as("size"),
          expr("CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT)")
            .as("cents"), $"p_partkey")
      val points = cand.groupBy($"size")
        .agg(min($"cents").as("cents"))
      // ≤50 rows from here on: the global window is bounded by the
      // size domain, never by N
      val wDesc = Window.orderBy($"size".desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val frontier = points
        .withColumn("best_larger", min($"cents").over(wDesc))
        .filter($"best_larger".isNull || $"cents" < $"best_larger")
        .select($"size", $"cents")
      val members = cand
        .join(broadcast(frontier), Seq("size", "cents"))
        .groupBy($"size", $"cents")
        .agg(count(lit(1)).as("n_parts"),
          min($"p_partkey").as("min_partkey"))
      val cert = frontier.as("a").join(frontier.as("b"),
          ($"b.cents" <= $"a.cents" && $"b.size" >= $"a.size") &&
          ($"b.cents" < $"a.cents" || $"b.size" > $"a.size"))
        .agg(count(lit(1)).as("dominated_in_frontier"))
      members.crossJoin(broadcast(cert))
        .select($"size", $"cents", $"n_parts", $"min_partkey",
          coalesce($"dominated_in_frontier", lit(0L))
            .as("dominated_in_frontier"))
        .orderBy($"size")
    },
    Some("""
      WITH cand AS (
        SELECT CAST(p_size AS BIGINT) AS size,
               CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS cents,
               p_partkey
        FROM part),
      points AS (
        SELECT size, MIN(cents) AS cents FROM cand GROUP BY size),
      fr AS (
        SELECT size, cents FROM points a
        WHERE NOT EXISTS (
          SELECT 1 FROM points b
          WHERE (b.cents <= a.cents AND b.size >= a.size)
            AND (b.cents < a.cents OR b.size > a.size))),
      members AS (
        SELECT c.size, c.cents, CAST(COUNT(*) AS BIGINT) AS n_parts,
               MIN(c.p_partkey) AS min_partkey
        FROM cand c JOIN fr ON c.size = fr.size AND c.cents = fr.cents
        GROUP BY c.size, c.cents),
      cert AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS dominated_in_frontier
        FROM fr a JOIN fr b
          ON (b.cents <= a.cents AND b.size >= a.size)
         AND (b.cents < a.cents OR b.size > a.size))
      SELECT m.size, m.cents, m.n_parts, m.min_partkey,
             c.dominated_in_frontier
      FROM members m, cert c ORDER BY m.size"""))

  /** Cohort retention — THE product-analytics table: users grouped by
    * first-activity week (their cohort), and for each cohort the
    * distinct users still active k weeks later, with the retention
    * rate against the cohort size. Everything is integer epoch-week
    * arithmetic (us DIV 604800000000 — the house integer-DIV rule; the
    * epoch-week origin is the same constant on both engines, so
    * alignment cannot wobble). Plan shape: ONE pass dedups the stream
    * to user-week pairs, a keyed min per user yields the cohort, and
    * the (cohort, k) rollup is a keyed aggregate over the joined
    * pairs — every stage map-side-combinable, the user-keyed join is
    * the only shuffle beyond the aggregates; at 100 TB the user-week
    * table is the small derivative of the stream (bounded by
    * users × weeks), which is the entire point of deduping FIRST.
    * k = 0 rows double as the cohort sizes (retention 1.0 by
    * definition — pinned in spec); the rate is one correctly-rounded
    * division over exact integers. */
  val retention_cohorts = GQuery(
    "retention_cohorts",
    (s, d) => {
      import s.implicits._
      val weekUs = 604800000000L
      val uw = T.events(s, d)
        .select($"user_id",
          expr(s"unix_micros(CAST(ts AS TIMESTAMP)) DIV $weekUs")
            .as("week"))
        .distinct()
      val cohort = uw.groupBy($"user_id")
        .agg(min($"week").as("cohort_week"))
      val sizes = cohort.groupBy($"cohort_week")
        .agg(count(lit(1)).as("cohort_size"))
      uw.join(cohort, "user_id")
        .groupBy($"cohort_week", ($"week" - $"cohort_week").as("k"))
        .agg(count(lit(1)).as("n_active"))
        .join(sizes, "cohort_week")
        .select($"cohort_week", $"k", $"n_active", $"cohort_size",
          round($"n_active".cast("double") /
            $"cohort_size".cast("double"), 6).as("retention"))
        .orderBy($"cohort_week", $"k")
    },
    Some("""
      WITH uw AS (
        SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
        FROM events),
      cohort AS (
        SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY 1),
      sizes AS (
        SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
        FROM cohort GROUP BY 1),
      act AS (
        SELECT c.cohort_week, uw.week - c.cohort_week AS k,
               CAST(COUNT(*) AS BIGINT) AS n_active
        FROM uw JOIN cohort c ON uw.user_id = c.user_id
        GROUP BY 1, 2)
      SELECT a.cohort_week, a.k, a.n_active, s.cohort_size,
             ROUND(CAST(a.n_active AS DOUBLE) /
                   CAST(s.cohort_size AS DOUBLE), 6) AS retention
      FROM act a JOIN sizes s ON a.cohort_week = s.cohort_week
      ORDER BY a.cohort_week, a.k"""))

  /** First-order event-transition matrix (behavioral Markov model):
    * for each consecutive (event → next event) pair within a user's
    * stream, the transition count and probability — the "what do
    * users do after X" table that powers next-action prediction and
    * anomaly detection. Consecutive means adjacent under the repo's
    * total event order (us, event_id), spelled identically in both
    * engines' LEAD/window clauses — a raw-timestamp order could
    * disagree on µs ties and swap a transition. One keyed sort window
    * per user (partition-parallel, per-key cost ∝ that user's
    * history — the sessionize shape), then a tiny (from, to) keyed
    * count; probabilities are rational over exact integers, one
    * correctly-rounded division each, with the out-degree total
    * carried in the row so the gate pins numerator AND denominator. */
  val event_transitions = GQuery(
    "event_transitions",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"us", $"event_id")
      val pairs = T.events(s, d)
        .select($"user_id", $"event_type",
          unix_micros($"ts".cast("timestamp")).as("us"), $"event_id")
        .withColumn("next_type", lead($"event_type", 1).over(w))
        .filter($"next_type".isNotNull)
        .groupBy($"event_type".as("from_type"),
          $"next_type".as("to_type"))
        .agg(count(lit(1)).as("n"))
      val outTotals = pairs.groupBy($"from_type")
        .agg(sum($"n").as("n_from"))
      pairs.join(outTotals, "from_type")
        .select($"from_type", $"to_type", $"n", $"n_from",
          round($"n".cast("double") / $"n_from".cast("double"), 6)
            .as("p"))
        .orderBy($"from_type", $"to_type")
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_type, event_id, epoch_us(ts) AS us
        FROM events),
      nx AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY us, event_id) AS next_type
        FROM e),
      pairs AS (
        SELECT event_type AS from_type, next_type AS to_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM nx WHERE next_type IS NOT NULL GROUP BY 1, 2),
      tot AS (
        SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
        FROM pairs GROUP BY 1)
      SELECT p.from_type, p.to_type, p.n, t.n_from,
             ROUND(CAST(p.n AS DOUBLE) / CAST(t.n_from AS DOUBLE), 6)
               AS p
      FROM pairs p JOIN tot t ON p.from_type = t.from_type
      ORDER BY p.from_type, p.to_type"""))

  /** Quality-filter calibration sweep — the curve a release engineer
    * reads BEFORE picking the corpus_release_e2e quality cutoff: for
    * each of 21 thresholds t = 0.00, 0.05, …, 1.00, the documents and
    * tokens surviving `quality ≥ t`, computed in ONE corpus pass.
    * Shape: per-doc quality (the curriculum_buckets scoring path,
    * identical expression both engines) quantized to exact integer
    * micro-units, bucketed by `qm DIV 50000` (21 domain-bounded
    * buckets — the histogram, not the corpus, is what aggregates),
    * then the survivor curve is a reverse-cumulative sum over the
    * 21-row bucket frame — a running [unbounded preceding, current]
    * frame over ORDER BY i DESC (the asof_forward reversed-frame
    * spelling; never [current, unbounded following]). The window is
    * partition-less by construction over EXACTLY 21 rows (the grid
    * frame, not data) — the bounded-domain exception to the
    * no-global-window rule, same as drift_chi2's 20 buckets. Missing
    * buckets are filled from a generated grid so the output is always
    * 21 rows with exact zeros. */
  val quality_threshold_sweep = GQuery(
    "quality_threshold_sweep",
    (s, d) => {
      import s.implicits._
      import graft.operators.{TextAnalysis => TA}
      val scored = T.documents(s, d)
        .select(TA.tokenCount($"text").as("n_tok"),
          TA.tokenStats($"text").as("st"))
        .select($"n_tok",
          round(round(TA.qualityFromStats($"st"), 6) * 1e6)
            .cast("long").as("qm"))
      val byBucket = scored
        .groupBy(least(expr("qm DIV 50000"), lit(20L)).as("i"))
        .agg(count(lit(1)).as("d"), sum($"n_tok").as("t"))
      val grid = s.range(21).select($"id".as("i"))
      val w = Window.orderBy($"i".desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(byBucket, Seq("i"), "left")
        .select($"i", coalesce($"d", lit(0L)).as("d"),
          coalesce($"t", lit(0L)).as("t"))
        .withColumn("n_docs", sum($"d").over(w))
        .withColumn("n_tokens", sum($"t").over(w))
        .select($"i".as("thr_bucket"), ($"i" * 50000L).as("thr_micro"),
          $"n_docs", $"n_tokens")
        .orderBy($"thr_bucket")
    },
    Some("""
      WITH f AS (
        SELECT doc_id,
               CAST(len(string_split(text,' ')) AS DOUBLE) AS n,
               CAST(len(list_filter(string_split(text,' '),
                 t -> t IN ('the','a','of','and','to'))) AS DOUBLE)
                 AS nstop,
               CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
                 AS ndist,
               CAST(length(replace(text,' ','')) AS DOUBLE) AS nchar,
               CAST(len(regexp_extract_all(text,'[A-Za-z]')) AS DOUBLE)
                 AS nalpha
        FROM documents),
      q AS (
        SELECT CAST(n AS BIGINT) AS n_tok,
               CAST(ROUND(ROUND(0.25 * (CASE WHEN n >= 20 AND n <= 200
                             THEN 1.0 ELSE 0.0 END)
                   + 0.25 * (CASE WHEN nstop / n >= 0.01
                                   AND nstop / n <= 0.6
                             THEN 1.0 ELSE 0.0 END)
                   + 0.25 * (CASE WHEN n > 0 THEN ndist / n
                             ELSE 0.0 END)
                   + 0.25 * (CASE WHEN nchar > 0 THEN nalpha / nchar
                             ELSE 0.0 END), 6) * 1000000) AS BIGINT)
                 AS qm
        FROM f),
      b AS (
        SELECT LEAST(qm // 50000, 20) AS i,
               CAST(COUNT(*) AS BIGINT) AS d,
               CAST(SUM(n_tok) AS BIGINT) AS t
        FROM q GROUP BY 1),
      g AS (SELECT CAST(range AS BIGINT) AS i FROM range(21)),
      j AS (
        SELECT g.i, COALESCE(b.d, 0) AS d, COALESCE(b.t, 0) AS t
        FROM g LEFT JOIN b ON g.i = b.i)
      SELECT i AS thr_bucket, i * 50000 AS thr_micro,
             CAST(SUM(d) OVER (ORDER BY i DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n_docs,
             CAST(SUM(t) OVER (ORDER BY i DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n_tokens
      FROM j ORDER BY thr_bucket"""))

  /** Mergeable-sketch NDV maintenance — the incremental-analytics
    * pattern for approximate aggregates (the IVM theme applied to
    * sketches): per-(event_type, day) HLL sketches are built in ONE
    * pass, PERSISTED as binary parquet, then rolled up into a
    * per-type NDV by unioning the stored sketches — history is never
    * rescanned. At 100 TB the daily sketch build is a map-side
    * partial aggregate whose state is one ~kB DataSketches HLL per
    * group, and every later rollup (any day range, any regrouping)
    * costs only a union over stored kB-sized blobs.
    *
    * What the gate pins, and what it deliberately does NOT: union
    * output is not estimate-identical to a one-shot sketch once the
    * sketch leaves sparse mode — DataSketches unions drop the HIP
    * accumulator and estimate from the composite register state, so
    * `union(dailies) == direct` holds at the verify SF (sparse mode
    * is exact) but NOT in dense mode (measured false at sf0.1,
    * n=1500). The property that IS exact at every scale — and the
    * one that makes distributed partial merges trustworthy — is
    * merge-tree ASSOCIATIVITY: register max-merge is associative and
    * commutative, so rolling dailies up through an intermediate
    * weekly level must give the BIT-IDENTICAL estimate to the flat
    * union. `tree_eq_flat` pins that two-level == one-level
    * identity; both estimates are additionally held within 5% of the
    * exact count (lgK=12 ⇒ σ≈1.6%). The oracle recomputes the exact
    * NDV and pins all three booleans TRUE. */
  val ndv_sketch_merge = GQuery(
    "ndv_sketch_merge",
    (s, d) => graft.GQuery.withTempTable(s, "graft-ndv-sketch") { dir =>
      import s.implicits._
      val base = T.events(s, d).select($"event_type",
        expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000")
          .as("day"),
        $"user_id")
      base.groupBy($"event_type", $"day")
        .agg(hll_sketch_agg($"user_id").as("sk"))
        .write.parquet(dir + "/daily_sketches")
      val daily = s.read.parquet(dir + "/daily_sketches")
      val flat = daily
        .groupBy($"event_type")
        .agg(hll_sketch_estimate(hll_union_agg($"sk"))
          .as("est_flat"))
      val tree = daily
        .groupBy($"event_type", expr("day DIV 7").as("week"))
        .agg(hll_union_agg($"sk").as("wk"))
        .groupBy($"event_type")
        .agg(hll_sketch_estimate(hll_union_agg($"wk"))
          .as("est_tree"))
      val direct = base.groupBy($"event_type")
        .agg(
          hll_sketch_estimate(hll_sketch_agg($"user_id"))
            .as("est_direct"),
          count_distinct($"user_id").as("n_exact"))
      flat.join(tree, Seq("event_type")).join(direct, Seq("event_type"))
        .select($"event_type", $"n_exact",
          (abs($"est_flat" - $"n_exact") * 100L <= $"n_exact" * 5L)
            .as("merged_ok"),
          (abs($"est_direct" - $"n_exact") * 100L <= $"n_exact" * 5L)
            .as("direct_ok"),
          ($"est_tree" === $"est_flat").as("tree_eq_flat"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, COUNT(DISTINCT user_id) AS n_exact,
             TRUE AS merged_ok, TRUE AS direct_ok,
             TRUE AS tree_eq_flat
      FROM events GROUP BY 1 ORDER BY 1"""))

  /** CUSUM changepoint detection per event series — the
    * data-drift-monitoring shape [[drift_chi2]] doesn't cover: WHERE
    * in time a daily-volume series shifted, not whether two
    * distributions differ. The classic statistic is
    * max_k |S_k − k·S_n/n| (cumulative deviation from the global
    * mean); multiplying through by n gives D_k = n·S_k − k·S_n —
    * EVERY term integral, so both engines compare identical integers
    * and the argmax is hash-gateable (libm-free, the znorm/χ²
    * lesson). Overflow bound: n ≤ 10^5 days and S_n ≤ 10^12 rows
    * keep |D_k| < 10^17 < 2^63. The plan collapses the event stream
    * to per-(type, day) counts FIRST (the only full-data shuffle,
    * map-side combined), then every window — running sum, row
    * number, whole-partition totals, argmax pick — reuses the single
    * event_type exchange over that tiny daily table; the
    * whole-partition frames are the orderBy-less kind Spark
    * evaluates once per partition. Tie-break: earliest day. */
  val cusum_changepoint = GQuery(
    "cusum_changepoint",
    (s, d) => {
      import s.implicits._
      val daily = T.events(s, d)
        .groupBy($"event_type",
          expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000")
            .as("day"))
        .agg(count(lit(1)).as("c"))
      val run = Window.partitionBy($"event_type").orderBy($"day")
      val whole = Window.partitionBy($"event_type")
      val dev = daily
        .withColumn("k", row_number().over(run).cast("long"))
        .withColumn("sk", sum($"c").over(run))
        .withColumn("n", count(lit(1)).over(whole))
        .withColumn("sn", sum($"c").over(whole))
        .withColumn("absdev", abs($"n" * $"sk" - $"k" * $"sn"))
      val pick = Window.partitionBy($"event_type")
        .orderBy($"absdev".desc, $"day".asc)
      dev.withColumn("rn", row_number().over(pick))
        .filter($"rn" === 1)
        .select($"event_type", $"day".as("change_day"),
          $"absdev".as("max_absdev"))
        .orderBy($"event_type")
    },
    Some("""
      WITH daily AS (
        SELECT event_type, epoch_us(ts) // 86400000000 AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
      dev AS (
        SELECT event_type, day,
               CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                 ORDER BY day) AS BIGINT) AS k,
               CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS sk,
               CAST(COUNT(*) OVER (PARTITION BY event_type)
                 AS BIGINT) AS n,
               CAST(SUM(c) OVER (PARTITION BY event_type)
                 AS BIGINT) AS sn
        FROM daily)
      SELECT event_type, day AS change_day,
             CAST(ABS(n * sk - k * sn) AS BIGINT) AS max_absdev
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
              ORDER BY ABS(n * sk - k * sn) DESC, day ASC) AS rn
            FROM dev)
      WHERE rn = 1 ORDER BY event_type"""))

  // ------------------------------------------------------------ r10b
  /** Per-group OLS regression (value-vs-time trend per event_type) —
    * the grouped trend fit a metrics pipeline runs to flag drifting
    * series. Everything up to the final division is EXACT integer
    * algebra: x = whole seconds since 2024-01-01 (integer DIV on both
    * engines, range ≤ 2.6e6 within the generated month), y = value in
    * micro-units, and the five moment sums (n, Σx, Σy, Σxy, Σx²)
    * cross the aggregate boundary as BIGINT/DECIMAL(38,0) per the
    * drift_chi2 widening rule — and the OPERANDS are widened to
    * DECIMAL(38,0) before the per-row multiply (not just the product
    * before the SUM), matching the oracle's HUGEINT-before-multiply
    * spelling: a long*long product wraps silently under non-ANSI
    * semantics once |y| ≥ ~3.04e9 (value ≥ ~3040), and because both
    * engines would wrap IDENTICALLY nothing would gate it (ADVICE-r10).
    * Slope and r² are then ONE double
    * division each over identically-spelled wide operands (num/den ~
    * 1e28 at sf10 fits DECIMAL(38,0)/HUGEINT; num² does NOT, so r²
    * multiplies the two double RATIOS instead of squaring the wide
    * int), rounded to 6.
    *
    * Shape: one map-side-combined groupBy over a 5-row output — the
    * classic moment-sum fold (corr_matrix_exact's discipline applied
    * to the regression pair), no window, no second pass. */
  val grouped_ols = GQuery(
    "grouped_ols",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
        .withColumn("us", unix_micros($"ts".cast("timestamp")))
        .select($"event_type",
          expr("us DIV 1000000 - 1704067200").as("x"),
          floor($"value" * 1000000d + 0.5d).cast("long").as("y"))
      val g = ev.groupBy($"event_type").agg(
        count(lit(1)).as("n"),
        sum($"x").as("sx"),
        sum($"y").as("sy"),
        sum($"x".cast("decimal(38,0)") * $"y".cast("decimal(38,0)"))
          .as("sxy"),
        sum($"x".cast("decimal(38,0)") * $"x".cast("decimal(38,0)"))
          .as("sxx"),
        sum($"y".cast("decimal(38,0)") * $"y".cast("decimal(38,0)"))
          .as("syy"))
      val nD = $"n".cast("decimal(38,0)")
      val num = nD * $"sxy" - $"sx".cast("decimal(38,0)") *
        $"sy".cast("decimal(38,0)")
      val den = nD * $"sxx" - $"sx".cast("decimal(38,0)") *
        $"sx".cast("decimal(38,0)")
      val dyy = nD * $"syy" - $"sy".cast("decimal(38,0)") *
        $"sy".cast("decimal(38,0)")
      g.select($"event_type", $"n", $"sx", $"sy",
          round(num.cast("double") / den.cast("double"), 6)
            .as("slope_micro_per_s"),
          round((num.cast("double") / den.cast("double")) *
            (num.cast("double") / dyy.cast("double")), 6).as("r2"))
        .orderBy($"event_type")
    },
    Some("""
      WITH ev AS (
        SELECT event_type,
               epoch_us(ts) // 1000000 - 1704067200 AS x,
               CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS y
        FROM events),
      g AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
               SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
               SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
        FROM ev GROUP BY event_type),
      w AS (
        SELECT event_type, n, sx, sy,
               CAST(n AS HUGEINT) * sxy
                 - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS num,
               CAST(n AS HUGEINT) * sxx
                 - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS den,
               CAST(n AS HUGEINT) * syy
                 - CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT) AS dyy
        FROM g)
      SELECT event_type, n, sx, sy,
             ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
               AS slope_micro_per_s,
             ROUND((CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) *
                   (CAST(num AS DOUBLE) / CAST(dyy AS DOUBLE)), 6)
               AS r2
      FROM w ORDER BY event_type"""))

  /** Welch two-sample t-test per event_type (A/B = user_id parity) —
    * the experiment-readout query. The moment sums are exact
    * (micro-unit BIGINT counts/sums; for Σy² the OPERANDS are widened
    * to DECIMAL(38,0)/HUGEINT before the per-row multiply so y²
    * cannot silently wrap at |y| ≥ ~3.04e9 — same ADVICE-r10 fix as
    * grouped_ols — and the wide product crosses the aggregate
    * boundary per the drift_chi2 rule); the t
    * statistic and Welch–Satterthwaite df are then computed in ONE
    * identically-spelled IEEE double tree on both engines (the house
    * float rule: doubles are gateable iff the operation tree is
    * identical — divisions and sqrt are deterministic), rounded to 6.
    * `significant` compares the UNROUNDED |t| against 1.96 so the
    * decision is pinned by the same tree, not the rounding.
    *
    * Shape: one map-side-combined groupBy (A/B disaggregation via
    * conditional sums, no second shuffle), 5-row output. */
  val ab_welch_t = GQuery(
    "ab_welch_t",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
        .select($"event_type", ($"user_id" % 2 === 0L).as("arm_a"),
          floor($"value" * 1000000d + 0.5d).cast("long").as("y"))
      val g = ev.groupBy($"event_type").agg(
        sum(when($"arm_a", 1L).otherwise(0L)).as("na"),
        sum(when(!$"arm_a", 1L).otherwise(0L)).as("nb"),
        sum(when($"arm_a", $"y").otherwise(0L)).as("sa"),
        sum(when(!$"arm_a", $"y").otherwise(0L)).as("sb"),
        sum(when($"arm_a",
            $"y".cast("decimal(38,0)") * $"y".cast("decimal(38,0)"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("qa"),
        sum(when(!$"arm_a",
            $"y".cast("decimal(38,0)") * $"y".cast("decimal(38,0)"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("qb"))
      val naD = $"na".cast("double"); val nbD = $"nb".cast("double")
      val saD = $"sa".cast("double"); val sbD = $"sb".cast("double")
      val va = ($"qa".cast("double") - saD * saD / naD) / (naD - 1d)
      val vb = ($"qb".cast("double") - sbD * sbD / nbD) / (nbD - 1d)
      val se2 = va / naD + vb / nbD
      val t = (saD / naD - sbD / nbD) / sqrt(se2)
      val df = se2 * se2 /
        ((va / naD) * (va / naD) / (naD - 1d) +
          (vb / nbD) * (vb / nbD) / (nbD - 1d))
      g.select($"event_type", $"na", $"nb", $"sa", $"sb",
          round(t, 6).as("t_welch"), round(df, 6).as("df_welch"),
          (abs(t) > 1.96d).as("significant"))
        .orderBy($"event_type")
    },
    Some("""
      WITH ev AS (
        SELECT event_type, user_id % 2 = 0 AS arm_a,
               CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS y
        FROM events),
      g AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN arm_a THEN 1 ELSE 0 END) AS BIGINT)
                 AS na,
               CAST(SUM(CASE WHEN arm_a THEN 0 ELSE 1 END) AS BIGINT)
                 AS nb,
               CAST(SUM(CASE WHEN arm_a THEN y ELSE 0 END) AS BIGINT)
                 AS sa,
               CAST(SUM(CASE WHEN arm_a THEN 0 ELSE y END) AS BIGINT)
                 AS sb,
               SUM(CASE WHEN arm_a THEN CAST(y AS HUGEINT)
                   * CAST(y AS HUGEINT) ELSE 0 END) AS qa,
               SUM(CASE WHEN arm_a THEN 0 ELSE CAST(y AS HUGEINT)
                   * CAST(y AS HUGEINT) END) AS qb
        FROM ev GROUP BY event_type),
      w AS (
        SELECT event_type, na, nb, sa, sb,
               (CAST(qa AS DOUBLE)
                 - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
                   / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1)
                 AS va,
               (CAST(qb AS DOUBLE)
                 - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
                   / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1)
                 AS vb
        FROM g),
      x AS (
        SELECT event_type, na, nb, sa, sb, va, vb,
               va / CAST(na AS DOUBLE) + vb / CAST(nb AS DOUBLE)
                 AS se2,
               (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
                 - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
                 / SQRT(va / CAST(na AS DOUBLE)
                        + vb / CAST(nb AS DOUBLE)) AS t
        FROM w)
      SELECT event_type, na, nb, sa, sb,
             ROUND(t, 6) AS t_welch,
             ROUND(se2 * se2 /
               ((va / CAST(na AS DOUBLE)) * (va / CAST(na AS DOUBLE))
                  / (CAST(na AS DOUBLE) - 1)
                + (vb / CAST(nb AS DOUBLE)) * (vb / CAST(nb AS DOUBLE))
                  / (CAST(nb AS DOUBLE) - 1)), 6) AS df_welch,
             ABS(t) > 1.96 AS significant
      FROM x ORDER BY event_type"""))

  /** Peak interval concurrency per (event_type, day) — the classic
    * sweep-line: each event opens an interval [start, start+dur) with
    * dur derived deterministically from its value (1 s … 1 h + 1 s),
    * intervals are CLIPPED at day boundaries into ≤ 2 per-day
    * segments (dur is bounded, so two is a proof not a heuristic),
    * each segment emits a +1/−1 marker pair, and a per-(type, day)
    * running sum over (t, delta DESC, event_id) — starts before ends
    * at the same instant, so touching intervals COUNT as concurrent,
    * pinned here — yields the concurrency profile whose max and
    * first-attained time are the gate.
    *
    * Shape: the window partitions are (type, day) — bounded by the
    * day clip, so no single partition grows with corpus lifetime (the
    * unbounded-key sweep is exactly what the Pack prefix-sum
    * machinery would replace at 100 TB; the day clip makes that swap
    * unnecessary here and the clipping algebra is the part worth
    * gating). One exchange: both Window nodes and the final aggregate
    * share the (type, day) partitioning. */
  val interval_concurrency = GQuery(
    "interval_concurrency",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val D = 86400000000L
      val ev = T.events(s, d)
        .withColumn("us", unix_micros($"ts".cast("timestamp")))
        .select($"event_id", $"event_type", $"us",
          (floor($"value" * 1000000d + 0.5d).cast("long") % 3600L *
            1000000L + 1000000L).as("dur"))
        .withColumn("fin", $"us" + $"dur")
        .withColumn("bound", (expr(s"us DIV ${D}L") + 1L) * D)
      val segs = ev.select($"event_id", $"event_type",
          explode(array(
            struct($"us".as("s"), least($"fin", $"bound").as("e")),
            struct($"bound".as("s"), $"fin".as("e")))).as("seg"))
        .filter($"seg.e" > $"seg.s")
      val marks = segs.select($"event_id", $"event_type",
          expr(s"seg.s DIV ${D}L").as("day"),
          explode(array(
            struct($"seg.s".as("t"), lit(1L).as("delta")),
            struct($"seg.e".as("t"), lit(-1L).as("delta")))).as("m"))
        .select($"event_id", $"event_type", $"day",
          $"m.t".as("t"), $"m.delta".as("delta"))
      val w = Window.partitionBy($"event_type", $"day")
        .orderBy($"t", $"delta".desc, $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val run = marks.withColumn("run", sum($"delta").over(w))
        .withColumn("peak", max($"run").over(
          Window.partitionBy($"event_type", $"day")))
      run.filter($"run" === $"peak")
        .groupBy($"event_type", $"day")
        .agg(first($"peak").as("peak"), min($"t").as("peak_at_us"))
        .orderBy($"event_type", $"day")
    },
    Some("""
      WITH ev AS (
        SELECT event_id, event_type, epoch_us(ts) AS us,
               CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) % 3600
                 * 1000000 + 1000000 AS dur
        FROM events),
      seg0 AS (
        SELECT event_id, event_type, us, us + dur AS fin,
               (us // 86400000000 + 1) * 86400000000 AS bound
        FROM ev),
      segs AS (
        SELECT event_id, event_type, us AS s,
               LEAST(fin, bound) AS e
        FROM seg0
        UNION ALL
        SELECT event_id, event_type, bound AS s, fin AS e
        FROM seg0 WHERE fin > bound),
      marks AS (
        SELECT event_id, event_type, s // 86400000000 AS day,
               s AS t, 1 AS delta FROM segs WHERE e > s
        UNION ALL
        SELECT event_id, event_type, s // 86400000000 AS day,
               e AS t, -1 AS delta FROM segs WHERE e > s),
      run AS (
        SELECT event_type, day, t,
               CAST(SUM(delta) OVER (
                 PARTITION BY event_type, day
                 ORDER BY t, delta DESC, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
        FROM marks),
      pk AS (
        SELECT event_type, day, t, run,
               MAX(run) OVER (PARTITION BY event_type, day) AS peak
        FROM run)
      SELECT event_type, day, ANY_VALUE(peak) AS peak,
             MIN(t) AS peak_at_us
      FROM pk WHERE run = peak
      GROUP BY event_type, day
      ORDER BY event_type, day"""))

  val all: Seq[GQuery] = Seq(sample_weighted, ngram_topk,
    vocab_coverage, label_gini, funnel_steps, corr_matrix_exact,
    window_distinct_users, pareto_frontier, retention_cohorts,
    event_transitions, quality_threshold_sweep, ndv_sketch_merge,
    cusum_changepoint, collocations_pmi, bpe_train, bpe_encode,
    outliers_mad, grouped_ols, ab_welch_t, interval_concurrency)
}
