package graft.queries

import org.apache.spark.sql.functions._
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

  val all: Seq[GQuery] = Seq(sample_weighted, ngram_topk,
    vocab_coverage, label_gini, funnel_steps)
}
