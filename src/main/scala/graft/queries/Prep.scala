package graft.queries

import org.apache.spark.sql.functions._
import graft.{GQuery, Tables => T}

/** Corpus-preparation wave: the remaining steps between a raw corpus
  * and a training run — RAG/window chunking, int8 embedding
  * quantization (storage/bandwidth at 100 TB), and the privacy pair
  * (keyed pseudonymization + k-anonymity suppression) that a dataset
  * release pipeline runs after [[graft.operators.TextAnalysis]]'s PII
  * scrub.
  *
  * Oracle determinism follows the house rules: integer or hash outputs
  * wherever possible; where doubles survive (quantization error,
  * suppressed value sums) the expression tree is spelled identically
  * on both engines so the IEEE result is bit-equal, and sums route
  * through DECIMAL(38,12).
  */
object Prep {

  /** Overlapping fixed-width character chunking — the RAG/window
    * splitter (W=200 chars, stride 120, so consecutive chunks share an
    * 80-char overlap). Output is the chunk CATALOG (offsets, widths,
    * md5 fingerprints), not the chunk text — the gate still covers
    * every chunk byte through the fingerprint while keeping the result
    * row-width flat. One scan + generator explode, no shuffle until
    * the final order; output rows ∝ corpus chars / stride.
    *
    * The documents table is ASCII (`length(text) == n_chars`
    * driver-generated), so char offsets agree byte-for-byte across
    * engines; both `sequence`/`generate_series` are inclusive-stop, and
    * chunk_ix = start DIV stride avoids any reliance on unnest
    * ordinality. A zero-length doc (none in this corpus) would make
    * Spark's `sequence(0, −1)` THROW while generate_series returns
    * empty — both sides clamp the stop to ≥0, so an empty doc yields
    * one empty chunk on both engines instead of a crash/divergence. */
  val chunk_windows = GQuery(
    "chunk_windows",
    (s, d) => {
      import s.implicits._
      T.documents(s, d)
        .withColumn("start",
          explode(sequence(lit(0L), greatest($"n_chars" - 1L, lit(0L)),
            lit(120L))))
        .select($"doc_id", expr("start DIV 120").as("chunk_ix"),
          $"start",
          expr("substring(text, CAST(start AS INT) + 1, 200)").as("chunk"))
        .select($"doc_id", $"chunk_ix", $"start",
          length($"chunk").cast("long").as("chunk_chars"),
          md5($"chunk").as("chunk_md5"))
        .orderBy($"doc_id", $"chunk_ix")
    },
    Some("""
      SELECT d.doc_id, t.s // 120 AS chunk_ix, t.s AS start,
             CAST(LENGTH(SUBSTR(d.text, CAST(t.s AS INT) + 1, 200)) AS BIGINT)
               AS chunk_chars,
             MD5(SUBSTR(d.text, CAST(t.s AS INT) + 1, 200)) AS chunk_md5
      FROM documents d,
           UNNEST(GENERATE_SERIES(0, GREATEST(d.n_chars - 1, 0), 120))
             AS t(s)
      ORDER BY doc_id, chunk_ix"""))

  /** Symmetric int8 quantization of the embedding matrix with a
    * per-dimension certificate: absmax scale per dim, then
    * q = floor(v·127/absmax + 0.5) clamped to [−127,127] — every
    * arithmetic step an identical IEEE tree on both engines (float
    * inputs widen exactly to double; the floor(x+0.5) spelling is the
    * house tie rule, `VectorExprs` precedent). The gated output is one
    * row per dimension computed FROM every quantized value: Σq and Σq²
    * as exact integers, the reconstruction-error max (order-independent
    * MAX of bit-identical doubles), and the scale itself. Execution
    * shape: posexplode → 64-key agg (map-side partials) → broadcast the
    * 64-row scale table back → second 64-key agg; the vector table is
    * scanned twice and never shuffled at width. */
  val embed_quant_int8 = GQuery(
    "embed_quant_int8",
    (s, d) => {
      import s.implicits._
      val el = T.embeddings(s, d)
        .select($"vec_id", posexplode($"embedding").as(Seq("dim", "vf")))
        .select($"vec_id", $"dim".cast("long").as("dim"),
          $"vf".cast("double").as("v"))
      val scales = el.groupBy($"dim")
        .agg(max(abs($"v")).as("amax"))
      val q = el.join(broadcast(scales), "dim")
        .withColumn("q",
          when($"amax" === 0d, lit(0L)).otherwise(
            greatest(lit(-127L), least(lit(127L),
              floor($"v" * 127d / $"amax" + 0.5d)))))
        .withColumn("err", abs($"q" * $"amax" / 127d - $"v"))
      q.groupBy($"dim")
        .agg(first($"amax").as("amax"),
          count(lit(1)).as("n"),
          sum($"q").as("sum_q"),
          sum($"q" * $"q").as("sum_q2"),
          max($"err").as("max_err"))
        .orderBy($"dim")
    },
    Some("""
      WITH el AS (
        SELECT e.vec_id, CAST(i.i AS BIGINT) AS dim,
               CAST(e.embedding[i.i + 1] AS DOUBLE) AS v
        FROM embeddings e,
             (SELECT CAST(range AS INT) AS i FROM range(64)) i),
      scales AS (SELECT dim, MAX(ABS(v)) AS amax FROM el GROUP BY dim),
      q AS (
        SELECT el.dim, scales.amax, el.v,
               CASE WHEN scales.amax = 0 THEN 0
                    ELSE GREATEST(-127, LEAST(127,
                      CAST(FLOOR(el.v * 127 / scales.amax + 0.5) AS BIGINT)))
               END AS q
        FROM el JOIN scales ON el.dim = scales.dim)
      SELECT dim, ANY_VALUE(amax) AS amax,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS BIGINT) AS sum_q,
             CAST(SUM(q * q) AS BIGINT) AS sum_q2,
             MAX(ABS(q * amax / 127 - v)) AS max_err
      FROM q GROUP BY dim ORDER BY dim"""))

  /** Matryoshka-style truncation quality curve: how much retrieval
    * geometry survives keeping only the first k of 64 embedding
    * dimensions — the report that decides whether a corpus can ship
    * truncated vectors (4×/8× cheaper ANN) without re-embedding.
    * Because a truncated vector is the PREFIX of the full one,
    * cos(full, trunc_k) has the closed form √(E_k/E_64) where E_k is
    * the prefix energy Σ_{i<k} v_i² — so the whole curve is three
    * extra left-folds per row, no second vector table and no joins.
    * Determinism discipline: each fold is the identical IEEE tree on
    * both engines (cast-to-double square, left-to-right additions —
    * the list_reduce(list_prepend) oracle spelling), √ and / are
    * correctly rounded (gateable; ln is not), per-row cosines are cast
    * to DECIMAL(38,12) before the cross-row SUM so the label averages
    * are exact until the final round(…, 6). Zero vectors are excluded
    * by the same E_64 > 0 predicate on both engines. Shape at 100 TB:
    * one scan, one label-keyed aggregate with map-side partials —
    * nothing else. */
  val embed_truncate = GQuery(
    "embed_truncate",
    (s, d) => {
      import s.implicits._
      def energy(k: Int): org.apache.spark.sql.Column = expr(
        s"aggregate(slice(embedding, 1, $k), 0D," +
          " (acc, x) -> acc + (CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,12)")
      T.embeddings(s, d)
        .select($"label", energy(8).as("e8"), energy(16).as("e16"),
          energy(32).as("e32"), energy(64).as("e64"))
        .filter($"e64" > 0d)
        .select($"label",
          dec(sqrt($"e8" / $"e64")).as("c8"),
          dec(sqrt($"e16" / $"e64")).as("c16"),
          dec(sqrt($"e32" / $"e64")).as("c32"),
          sqrt($"e32" / $"e64").as("c32d"))
        .groupBy($"label")
        .agg(count(lit(1)).as("n"),
          round(sum($"c8").cast("double") / count(lit(1)), 6)
            .as("avg_cos_8"),
          round(sum($"c16").cast("double") / count(lit(1)), 6)
            .as("avg_cos_16"),
          round(sum($"c32").cast("double") / count(lit(1)), 6)
            .as("avg_cos_32"),
          min($"c32d").as("min_cos_32"))
        .orderBy($"label")
    },
    Some("""
      WITH e AS (
        SELECT label,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(embedding[1:8],
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                 (acc, x) -> acc + x) AS e8,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(embedding[1:16],
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                 (acc, x) -> acc + x) AS e16,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(embedding[1:32],
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                 (acc, x) -> acc + x) AS e32,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(embedding[1:64],
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                 (acc, x) -> acc + x) AS e64
        FROM embeddings),
      c AS (
        SELECT label,
               CAST(SQRT(e8 / e64) AS DECIMAL(38,12)) AS c8,
               CAST(SQRT(e16 / e64) AS DECIMAL(38,12)) AS c16,
               CAST(SQRT(e32 / e64) AS DECIMAL(38,12)) AS c32,
               SQRT(e32 / e64) AS c32d
        FROM e WHERE e64 > 0)
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(CAST(SUM(c8) AS DOUBLE) / COUNT(*), 6) AS avg_cos_8,
             ROUND(CAST(SUM(c16) AS DOUBLE) / COUNT(*), 6) AS avg_cos_16,
             ROUND(CAST(SUM(c32) AS DOUBLE) / COUNT(*), 6) AS avg_cos_32,
             MIN(c32d) AS min_cos_32
      FROM c GROUP BY label ORDER BY label"""))

  /** Keyed pseudonymization of the user-id column (the release-side
    * companion to text_pii_scrub): pseudonym = SHA-256 over a salted
    * rendering of the id, with the injectivity certificate IN the
    * gated output — n_users per pseudonym (must be 1; a hash collision
    * or a salting bug would surface as 2) and the row count itself
    * equal to the distinct-user count. One keyed aggregate; the
    * pseudonym column is computed map-side, so at cluster scale this
    * is a single shuffle on the new key. */
  val anonymize_ids = GQuery(
    "anonymize_ids",
    (s, d) => {
      import s.implicits._
      T.events(s, d)
        .withColumn("pseudonym",
          sha2(concat(lit("graft-salt-1:"), $"user_id".cast("string")), 256))
        .withColumn("us", unix_micros($"ts".cast("timestamp")))
        .groupBy($"pseudonym")
        .agg(count(lit(1)).as("n_events"),
          countDistinct($"user_id").as("n_users"),
          countDistinct($"event_type").as("n_types"),
          min($"us").as("first_us"), max($"us").as("last_us"))
        .orderBy($"pseudonym")
    },
    Some("""
      SELECT sha256('graft-salt-1:' || CAST(user_id AS VARCHAR)) AS pseudonym,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
             MIN(epoch_us(ts)) AS first_us, MAX(epoch_us(ts)) AS last_us
      FROM events GROUP BY 1 ORDER BY pseudonym"""))

  /** k-anonymity suppression over the (day, event_type)
    * quasi-identifier: groups with fewer than k=20 rows are withheld
    * from the release and folded into one __SUPPRESSED__ summary row
    * (group count, row count, value mass) — the standard shape of a
    * k-anonymized data release. One keyed aggregate then a tiny
    * split/union over the GROUP table (day×type cardinality, not
    * rows); value sums route through DECIMAL(38,12) per the house
    * float-sum rule. */
  val kanon_suppress = GQuery(
    "kanon_suppress",
    (s, d) => {
      import s.implicits._
      val g = T.events(s, d)
        .withColumn("day", date_format($"ts".cast("timestamp"), "yyyy-MM-dd"))
        .groupBy($"day", $"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"value".cast("decimal(38,12)")).as("val_dec"))
      val released = g.filter($"n" >= 20L)
        .select($"day", $"event_type", $"n",
          round($"val_dec".cast("double"), 6).as("val_sum"),
          lit(1L).as("n_groups"))
      val suppressed = g.filter($"n" < 20L)
        .agg(count(lit(1)).as("n_groups"), sum($"n").as("n"),
          round(sum($"val_dec").cast("double"), 6).as("val_sum"))
        .select(lit("__ALL__").as("day"),
          lit("__SUPPRESSED__").as("event_type"),
          coalesce($"n", lit(0L)).as("n"),
          coalesce($"val_sum", lit(0d)).as("val_sum"),
          $"n_groups")
      released.unionByName(suppressed)
        .orderBy($"day", $"event_type")
    },
    Some("""
      WITH g AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(value AS DECIMAL(38,12))) AS val_dec
        FROM events GROUP BY 1, 2)
      SELECT day, event_type, n,
             ROUND(CAST(val_dec AS DOUBLE), 6) AS val_sum,
             CAST(1 AS BIGINT) AS n_groups
      FROM g WHERE n >= 20
      UNION ALL
      SELECT '__ALL__', '__SUPPRESSED__',
             COALESCE(CAST(SUM(n) AS BIGINT), 0),
             COALESCE(ROUND(CAST(SUM(val_dec) AS DOUBLE), 6), 0.0),
             CAST(COUNT(*) AS BIGINT)
      FROM g WHERE n < 20
      ORDER BY day, event_type"""))

  /** Two-sample distribution-drift report between the reference and
    * current halves of the event stream (deterministic event_id % 2
    * split so the oracle replays the identical partition): 20
    * equi-width buckets over exact integer cents (floor(x·100+0.5)
    * house tie rule, integer-DIV bucketing — the histogram_prices
    * shape), then a per-bucket two-sample χ² contribution
    * (aM−bN)² / (NM(a+b)) with the numerator and denominator
    * exact integers (DECIMAL(38,0) / HUGEINT — diff² reaches 1e28)
    * and ONE double division at the end. The statistic is emitted
    * per-bucket rather than summed: each division is correctly
    * rounded IEEE and thus engine-identical, while a 20-term double
    * SUM would depend on aggregation order. PSI's ln() is avoided
    * deliberately — transcendental libm results are not
    * correctly-rounded-guaranteed across engines. Two broadcast
    * 1-row assemblies (bounds, totals); the event table is scanned
    * once per assembly and never shuffled at width. */
  val drift_chi2 = GQuery(
    "drift_chi2",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
        .select(floor($"value" * 100d + 0.5d).cast("long").as("cents"),
          ($"event_id" % 2 === 0L).as("is_ref"))
      val bounds = ev.agg(min($"cents").as("min_c"),
        max($"cents").as("max_c"))
      val buckets = ev.crossJoin(broadcast(bounds))
        .select(expr("(cents - min_c) * 20 DIV (max_c - min_c + 1)")
          .as("bucket"), $"is_ref")
        .groupBy($"bucket")
        .agg(sum(when($"is_ref", 1L).otherwise(0L)).as("a"),
          sum(when($"is_ref", 0L).otherwise(1L)).as("b"))
      val tot = buckets.agg(sum($"a").as("nn"), sum($"b").as("mm"))
      // every operand widens to DECIMAL(38,0) BEFORE any product —
      // a*mm and nn*mm reach ~1e20 at 100 TB event counts, past
      // 2^63, so a Long intermediate would overflow (ANSI throw)
      // before the wide cast could save it
      val aD = $"a".cast("decimal(38,0)")
      val bD = $"b".cast("decimal(38,0)")
      val nnD = $"nn".cast("decimal(38,0)")
      val mmD = $"mm".cast("decimal(38,0)")
      val diff = aD * mmD - bD * nnD
      buckets.crossJoin(broadcast(tot))
        .select($"bucket", $"a".as("n_ref"), $"b".as("n_cur"),
          when($"nn" === 0L || $"mm" === 0L,
            lit(null).cast("double")).otherwise(round(
            (diff * diff).cast("double") /
            (nnD * mmD * (aD + bD)).cast("double"),
            6)).as("chi2_term"))
        .orderBy($"bucket")
    },
    Some("""
      WITH ev AS (
        SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
               event_id % 2 = 0 AS is_ref
        FROM events),
      bounds AS (SELECT MIN(cents) AS min_c, MAX(cents) AS max_c
                 FROM ev),
      buckets AS (
        SELECT (cents - min_c) * 20 // (max_c - min_c + 1) AS bucket,
               CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)
                 AS a,
               CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT)
                 AS b
        FROM ev, bounds GROUP BY 1),
      tot AS (SELECT CAST(SUM(a) AS BIGINT) AS nn,
                     CAST(SUM(b) AS BIGINT) AS mm FROM buckets)
      , wide AS (
        SELECT bucket, a, b,
               CAST(a AS HUGEINT) AS ah, CAST(b AS HUGEINT) AS bh,
               CAST(nn AS HUGEINT) AS nnh, CAST(mm AS HUGEINT) AS mmh,
               nn, mm
        FROM buckets, tot)
      SELECT bucket, a AS n_ref, b AS n_cur,
             CASE WHEN nn = 0 OR mm = 0 THEN NULL ELSE ROUND(
               CAST((ah * mmh - bh * nnh)
                    * (ah * mmh - bh * nnh) AS DOUBLE) /
               CAST(nnh * mmh * (ah + bh) AS DOUBLE),
               6) END AS chi2_term
      FROM wide ORDER BY bucket"""))

  /** Referential-integrity audit with planted breaks (the
    * plant-and-detect pattern, dedup_lsh_recall precedent): a
    * deterministically-corrupted copy of lineitem bumps l_orderkey
    * out of the parent domain for rows with
    * (l_orderkey·31 + l_partkey) % 97 = 0, then three FK
    * relationships are audited by anti-join — the corrupted child
    * (must surface EXACTLY the planted orphans) and the two clean
    * ones (must report zero, proving the detector doesn't
    * false-positive). Parents broadcast at audit SF; at cluster
    * scale each audit is one keyed shuffle. */
  val fk_violations = GQuery(
    "fk_violations",
    (s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d).select($"l_orderkey", $"l_partkey")
      val corrupted = li.select(
        when(($"l_orderkey" * 31L + $"l_partkey") % 97 === 0L,
          $"l_orderkey" + 10000000L).otherwise($"l_orderkey")
          .as("l_orderkey"),
        $"l_partkey")
      val orders = T.orders(s, d).select($"o_orderkey", $"o_custkey")
      val cust = T.customer(s, d).select($"c_custkey")
      val part = T.part(s, d).select($"p_partkey")
      def audit(rel: String, child: org.apache.spark.sql.DataFrame,
          key: String, parent: org.apache.spark.sql.DataFrame,
          pkey: String) = {
        val orphans = child.join(broadcast(parent),
          child(key) === parent(pkey), "left_anti")
        child.agg(count(lit(1)).as("n_child"))
          .crossJoin(orphans.agg(count(lit(1)).as("n_orphans"),
            countDistinct(col(key)).as("n_orphan_keys")))
          .select(lit(rel).as("rel"), $"n_child", $"n_orphans",
            $"n_orphan_keys")
      }
      audit("lineitem.l_orderkey->orders", corrupted, "l_orderkey",
          orders, "o_orderkey")
        .unionByName(audit("orders.o_custkey->customer", orders,
          "o_custkey", cust, "c_custkey"))
        .unionByName(audit("lineitem.l_partkey->part", li,
          "l_partkey", part, "p_partkey"))
        .orderBy($"rel")
    },
    Some("""
      WITH corrupted AS (
        SELECT CASE WHEN (l_orderkey * 31 + l_partkey) % 97 = 0
                    THEN l_orderkey + 10000000 ELSE l_orderkey END
                 AS l_orderkey,
               l_partkey
        FROM lineitem),
      r1 AS (
        SELECT 'lineitem.l_orderkey->orders' AS rel,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM corrupted)
                 AS n_child,
               CAST(COUNT(*) AS BIGINT) AS n_orphans,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
                 AS n_orphan_keys
        FROM corrupted c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = c.l_orderkey)),
      r2 AS (
        SELECT 'orders.o_custkey->customer' AS rel,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders)
                 AS n_child,
               CAST(COUNT(*) AS BIGINT) AS n_orphans,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
                 AS n_orphan_keys
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)),
      r3 AS (
        SELECT 'lineitem.l_partkey->part' AS rel,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem)
                 AS n_child,
               CAST(COUNT(*) AS BIGINT) AS n_orphans,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT)
                 AS n_orphan_keys
        FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM part p
                          WHERE p.p_partkey = l.l_partkey))
      SELECT * FROM r1 UNION ALL SELECT * FROM r2
      UNION ALL SELECT * FROM r3 ORDER BY rel"""))

  /** Per-source quota capping (domain capping, the CommonCrawl-style
    * curation step: no source may contribute more than K docs).
    * Selection priority is a deterministic salted-md5 shuffle — an
    * unkeyed "random" order both engines reproduce exactly, with
    * doc_id as the total-order tiebreak — so the kept set is a pure
    * function of the corpus. One window over the source partitioning
    * (a single keyed shuffle) — the readable baseline; the
    * bounded-memory production form of the SAME result and oracle is
    * [[source_cap_agg]] (TopKAgg, O(K) state per group vs the
    * window's whole-group sort). Output: the survivor catalog
    * (source, rank, doc_id). */
  val source_cap = GQuery(
    "source_cap",
    (s, d) => {
      import s.implicits._
      val pri = T.documents(s, d)
        .select($"doc_id", $"source",
          md5(concat(lit("cap-salt:"), $"doc_id".cast("string")))
            .as("pri"))
      val ranked = pri.withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy($"source").orderBy($"pri", $"doc_id")))
      ranked.filter($"rk" <= 3)
        .select($"source", $"rk".cast("long").as("rk"), $"doc_id")
        .orderBy($"source", $"rk")
    },
    Some("""
      WITH pri AS (
        SELECT doc_id, source,
               md5('cap-salt:' || CAST(doc_id AS VARCHAR)) AS pri
        FROM documents),
      ranked AS (
        SELECT source, doc_id,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY pri, doc_id) AS rk
        FROM pri)
      SELECT source, CAST(rk AS BIGINT) AS rk, doc_id
      FROM ranked WHERE rk <= 3 ORDER BY source, rk"""))

  /** The bounded-memory form of [[source_cap]]: identical result
    * (and the IDENTICAL oracle SQL — one gate, two plans), but
    * selection runs through [[graft.operators.TopK.TopKAgg]], a
    * native TypedImperativeAggregate holding exactly K entries per
    * group with map-side partials — instead of a window that sorts
    * and materializes every group. The window form is the readable
    * baseline; this is the 100 TB path when a hot source holds
    * billions of rows (window state O(group), aggregate state O(K)).
    */
  val source_cap_agg = GQuery(
    "source_cap_agg",
    (s, d) => {
      import s.implicits._
      import graft.operators.TopK
      T.documents(s, d)
        .select($"doc_id", $"source",
          md5(concat(lit("cap-salt:"), $"doc_id".cast("string")))
            .as("pri"))
        .groupBy($"source")
        .agg(TopK.topK($"pri", $"doc_id", 3).as("top"))
        .select($"source", posexplode($"top").as(Seq("pos", "e")))
        .select($"source", ($"pos" + 1).cast("long").as("rk"),
          $"e.id".as("doc_id"))
        .orderBy($"source", $"rk")
    },
    source_cap.oracle)

  /** Cross-document repeated-chunk detection over the
    * [[chunk_windows]] catalog — the boilerplate detector (repeated
    * headers/footers/templates surface as the same chunk fingerprint
    * in multiple places; 31 such chunks exist at sf0.01, planted by
    * the corpus's duplicate documents). One groupBy over the chunk
    * fingerprints; n_docs < n_occurrences distinguishes
    * WITHIN-document repetition from cross-document boilerplate. */
  val chunk_dedup = GQuery(
    "chunk_dedup",
    (s, d) => {
      import s.implicits._
      T.documents(s, d)
        .withColumn("start",
          explode(sequence(lit(0L), greatest($"n_chars" - 1L, lit(0L)),
            lit(120L))))
        .select($"doc_id",
          md5(expr("substring(text, CAST(start AS INT) + 1, 200)"))
            .as("chunk_md5"))
        .groupBy($"chunk_md5")
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct($"doc_id").as("n_docs"),
          min($"doc_id").as("first_doc"))
        .filter($"n_occurrences" > 1L)
        .orderBy($"chunk_md5")
    },
    Some("""
      WITH c AS (
        SELECT d.doc_id,
               MD5(SUBSTR(d.text, CAST(t.s AS INT) + 1, 200)) AS chunk_md5
        FROM documents d,
             UNNEST(GENERATE_SERIES(0, GREATEST(d.n_chars - 1, 0), 120))
               AS t(s))
      SELECT chunk_md5, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             MIN(doc_id) AS first_doc
      FROM c GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY chunk_md5"""))

  /** Group-wise z-score normalization (the feature-scaling step) with
    * the moments kept EXACT until one final double expression: per
    * language, n/Σv/Σv² are integers (n_chars is integral), the
    * variance numerator ssn = n·Σv² − (Σv)² is exact DECIMAL/HUGEINT,
    * and z = (v·n − Σv) / (n · √(ssn / (n·(n−1)))) is spelled as the
    * identical IEEE tree on both engines — every cast and division
    * correctly rounded, and √ IS correctly rounded per IEEE-754
    * (unlike ln/exp, which is why drift_chi2 avoids PSI but z-scores
    * CAN be gated). Execution: one 5-key moment aggregate broadcast
    * back over the scan — the embed_quant shape; the doc table never
    * shuffles. */
  val znorm_features = GQuery(
    "znorm_features",
    (s, d) => {
      import s.implicits._
      val docs = T.documents(s, d).select($"doc_id", $"lang", $"n_chars")
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val st = docs.groupBy($"lang")
        .agg(count(lit(1)).as("n"), sum($"n_chars").as("sv"),
          sum($"n_chars" * $"n_chars").as("svv"))
        .select($"lang", $"n", $"sv",
          (dec($"n") * dec($"svv") - dec($"sv") * dec($"sv")).as("ssn"))
      docs.join(broadcast(st), "lang")
        .select($"doc_id", $"lang", $"n_chars",
          when($"n" < 2L, lit(null).cast("double")).otherwise(round(
            ($"n_chars" * $"n" - $"sv").cast("double") /
              ($"n".cast("double") *
                sqrt($"ssn".cast("double") /
                  ($"n".cast("double") * ($"n" - 1L).cast("double")))),
            6)).as("z"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH st AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(n_chars) AS BIGINT) AS sv,
               CAST(COUNT(*) AS HUGEINT)
                 * CAST(SUM(n_chars * n_chars) AS HUGEINT)
                 - CAST(SUM(n_chars) AS HUGEINT)
                 * CAST(SUM(n_chars) AS HUGEINT) AS ssn
        FROM documents GROUP BY 1)
      SELECT d.doc_id, d.lang, d.n_chars,
             CASE WHEN st.n < 2 THEN NULL ELSE ROUND(
               CAST(d.n_chars * st.n - st.sv AS DOUBLE) /
                 (CAST(st.n AS DOUBLE) *
                   SQRT(CAST(st.ssn AS DOUBLE) /
                     (CAST(st.n AS DOUBLE) * CAST(st.n - 1 AS DOUBLE)))),
               6) END AS z
      FROM documents d JOIN st ON d.lang = st.lang
      ORDER BY d.doc_id"""))

  /** Winsorization (percentile outlier clipping) on EXACT rank
    * arithmetic: per order-priority group, p01/p99 are the cents
    * values at ranks ceil(0.01·n)/ceil(0.99·n) of the
    * (cents, orderkey) total order — no interpolation, no
    * engine-specific quantile rule, just ROW_NUMBER and one identical
    * ceil(double) both engines — then every value clips into
    * [p01, p99] and the gate covers exact integer clip counts and the
    * clipped sum. The rank pass is a per-group window sort — the
    * oracle-checkable EXACT baseline, fenced like the exact-NDV
    * profile: at 100 TB the production path is [[winsorize_approx]]
    * (one sketch aggregate, no window), and this row is what proves
    * it right. */
  val winsorize_clip = GQuery(
    "winsorize_clip",
    (s, d) => {
      import s.implicits._
      val o = T.orders(s, d).select($"o_orderpriority".as("grp"),
        round($"o_totalprice" * 100).cast("long").as("cents"),
        $"o_orderkey")
      val ranked = o.withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy($"grp").orderBy($"cents", $"o_orderkey")))
      val stats = ranked.groupBy($"grp").agg(count(lit(1)).as("n"))
        .select($"grp", $"n", ceil($"n" * 0.01).as("lo_rk"),
          ceil($"n" * 0.99).as("hi_rk"))
      val bounds = ranked.join(broadcast(stats), "grp")
        .filter($"rk" === $"lo_rk" || $"rk" === $"hi_rk")
        .groupBy($"grp")
        .agg(min(when($"rk" === $"lo_rk", $"cents")).as("p01_cents"),
          min(when($"rk" === $"hi_rk", $"cents")).as("p99_cents"))
      o.join(broadcast(bounds), "grp")
        .select($"grp", $"cents", $"p01_cents", $"p99_cents",
          least(greatest($"cents", $"p01_cents"), $"p99_cents")
            .as("clipped"))
        .groupBy($"grp")
        .agg(count(lit(1)).as("n"),
          first($"p01_cents").as("p01_cents"),
          first($"p99_cents").as("p99_cents"),
          sum(when($"cents" < $"p01_cents", 1L).otherwise(0L))
            .as("n_clip_lo"),
          sum(when($"cents" > $"p99_cents", 1L).otherwise(0L))
            .as("n_clip_hi"),
          sum($"clipped").as("sum_clipped_cents"))
        .orderBy($"grp")
    },
    Some("""
      WITH o AS (
        SELECT o_orderpriority AS grp,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey
        FROM orders),
      ranked AS (
        SELECT grp, cents,
               ROW_NUMBER() OVER (PARTITION BY grp
                                  ORDER BY cents, o_orderkey) AS rk
        FROM o),
      stats AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(CEIL(COUNT(*) * 0.01) AS BIGINT) AS lo_rk,
               CAST(CEIL(COUNT(*) * 0.99) AS BIGINT) AS hi_rk
        FROM o GROUP BY 1),
      bounds AS (
        SELECT r.grp,
               MIN(CASE WHEN r.rk = s.lo_rk THEN r.cents END)
                 AS p01_cents,
               MIN(CASE WHEN r.rk = s.hi_rk THEN r.cents END)
                 AS p99_cents
        FROM ranked r JOIN stats s ON r.grp = s.grp
        WHERE r.rk = s.lo_rk OR r.rk = s.hi_rk
        GROUP BY 1)
      SELECT o.grp, CAST(COUNT(*) AS BIGINT) AS n,
             ANY_VALUE(b.p01_cents) AS p01_cents,
             ANY_VALUE(b.p99_cents) AS p99_cents,
             CAST(SUM(CASE WHEN o.cents < b.p01_cents THEN 1 ELSE 0 END)
               AS BIGINT) AS n_clip_lo,
             CAST(SUM(CASE WHEN o.cents > b.p99_cents THEN 1 ELSE 0 END)
               AS BIGINT) AS n_clip_hi,
             CAST(SUM(LEAST(GREATEST(o.cents, b.p01_cents),
               b.p99_cents)) AS BIGINT) AS sum_clipped_cents
      FROM o JOIN bounds b ON o.grp = b.grp
      GROUP BY 1 ORDER BY o.grp"""))

  /** The winsorize PRODUCTION path at 100 TB — the same clip decision
    * as [[winsorize_clip]] but with the per-group bounds from
    * `percentile_approx` (Greenwald–Khanna sketch, accuracy 100):
    * ONE hash aggregate with map-side-mergeable sketch partials and
    * no window sort, where the exact-rank baseline concentrates each
    * group on one partition (its measured 8.93×/decade fence). The
    * sketch's VALUES cannot cross engines (they are merge-order- and
    * engine-dependent), so the gate hashes what IS invariant: GK's
    * worst-case guarantee. With accuracy a = 100 the returned bound
    * for quantile q has rank within ε·n of q·n, ε = 1/a — and at
    * verify SF the sketch genuinely approximates (n = 3000 per group
    * ≫ a; a 10000-accuracy sketch would be exact below 10k rows and
    * gate nothing). The contract booleans bracket the bound's rank
    * interval [count(< bound)+1, count(≤ bound)] against
    * [q·n − ε·n, q·n + ε·n], and the clip-count fences
    * (n_clip ≤ (q+ε)·n per side) follow from the same counts; the
    * oracle pins every boolean TRUE plus the exact group sizes.
    * Precedent: source_cap / source_cap_agg — same decision, two
    * plans, the scale path contract-gated against the exact one. */
  val winsorize_approx = GQuery(
    "winsorize_approx",
    (s, d) => {
      import s.implicits._
      val acc = 100
      val eps = 1.0 / acc
      val o = T.orders(s, d).select($"o_orderpriority".as("grp"),
        round($"o_totalprice" * 100).cast("long").as("cents"))
      val ap = o.groupBy($"grp")
        .agg(count(lit(1)).as("n"),
          percentile_approx($"cents", lit(0.01), lit(acc)).as("lo_b"),
          percentile_approx($"cents", lit(0.99), lit(acc)).as("hi_b"))
      val counts = o.join(broadcast(ap), "grp")
        .groupBy($"grp")
        .agg(first($"n").as("n"),
          sum(when($"cents" < $"lo_b", 1L).otherwise(0L)).as("lt_lo"),
          sum(when($"cents" <= $"lo_b", 1L).otherwise(0L)).as("le_lo"),
          sum(when($"cents" < $"hi_b", 1L).otherwise(0L)).as("lt_hi"),
          sum(when($"cents" <= $"hi_b", 1L).otherwise(0L)).as("le_hi"))
      def inContract(q: Double,
          lt: org.apache.spark.sql.Column,
          le: org.apache.spark.sql.Column) =
        lt.cast("double") <= $"n".cast("double") * (q + eps) &&
          le.cast("double") >= $"n".cast("double") * (q - eps)
      counts.select($"grp", $"n",
          inContract(0.01, $"lt_lo", $"le_lo").as("lo_in_contract"),
          inContract(0.99, $"lt_hi", $"le_hi").as("hi_in_contract"),
          ($"lt_lo".cast("double") <=
            $"n".cast("double") * (0.01 + eps)).as("clip_lo_bounded"),
          (($"n" - $"le_hi").cast("double") <=
            $"n".cast("double") * (0.01 + eps)).as("clip_hi_bounded"))
        .orderBy($"grp")
    },
    Some("""
      SELECT o_orderpriority AS grp, CAST(COUNT(*) AS BIGINT) AS n,
             TRUE AS lo_in_contract, TRUE AS hi_in_contract,
             TRUE AS clip_lo_bounded, TRUE AS clip_hi_bounded
      FROM orders GROUP BY 1 ORDER BY grp"""))

  /** Purged time-series split: K=5 contiguous time folds over the
    * event stream with a 1-day embargo band at every interior fold
    * boundary — the leakage-safe cross-validation layout for temporal
    * data (a model tested on fold k must not train on rows whose
    * features look across k's boundary; the embargo bands are what a
    * purged-CV harness drops). All arithmetic is exact integers:
    * epoch-µs longs, fold = (us − lo)·K DIV span, boundaries at
    * lo + span·k DIV K, embargo membership by integer distance to the
    * owning fold's edges — both engines share every DIV (house rule).
    * Overflow bound: (us−lo)·K ≤ span·K ≈ 1.3·10¹³ ≪ 2⁶³ (and the
    * span of any real dataset is < 10¹⁵ µs ≈ 30 years, so ·5 never
    * overflows). Plan shape: one 1-row min/max aggregate broadcast
    * back (the only global structure — the sample_weighted
    * precedent), then a map-side fold/embargo classification and one
    * keyed aggregate; scan-floor at any SF. head = too close to the
    * fold's own start (would leak from the previous fold under
    * purging), tail = too close to its end; terminal edges (start of
    * fold 0, end of fold K−1) have no neighbor and are exempt. */
  val split_time_embargo = GQuery(
    "split_time_embargo",
    (s, d) => {
      import s.implicits._
      val k = 5
      val embargoUs = 86400000000L // 1 day
      val ev = T.events(s, d)
        .select(unix_micros($"ts".cast("timestamp")).as("us"))
      val bounds = ev.agg(min($"us").as("lo"), max($"us").as("hi"))
      ev.crossJoin(broadcast(bounds))
        .withColumn("span", $"hi" - $"lo" + 1L)
        .withColumn("fold",
          expr(s"least((us - lo) * $k DIV span, ${k - 1})"))
        .withColumn("fstart", expr(s"lo + span * fold DIV $k"))
        .withColumn("fend", expr(s"lo + span * (fold + 1) DIV $k"))
        .withColumn("emb_head",
          ($"fold" > 0 && $"us" - $"fstart" < embargoUs)
            .cast("long"))
        .withColumn("emb_tail",
          ($"fold" < k - 1 && $"fend" - $"us" <= embargoUs)
            .cast("long"))
        .groupBy($"fold")
        .agg(count(lit(1)).as("n_rows"),
          sum($"emb_head").as("n_embargo_head"),
          sum($"emb_tail").as("n_embargo_tail"),
          min($"us").as("min_us"), max($"us").as("max_us"))
        .orderBy($"fold")
    },
    Some("""
      WITH e AS (SELECT epoch_us(ts) AS us FROM events),
      b AS (SELECT MIN(us) AS lo, MAX(us) AS hi,
                   MAX(us) - MIN(us) + 1 AS span FROM e),
      f AS (
        SELECT us,
               LEAST((us - lo) * 5 // span, 4) AS fold,
               lo, span
        FROM e, b),
      g AS (
        SELECT us, fold,
               lo + span * fold // 5 AS fstart,
               lo + span * (fold + 1) // 5 AS fend
        FROM f)
      SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN fold > 0
                            AND us - fstart < 86400000000
                           THEN 1 ELSE 0 END) AS BIGINT)
               AS n_embargo_head,
             CAST(SUM(CASE WHEN fold < 4
                            AND fend - us <= 86400000000
                           THEN 1 ELSE 0 END) AS BIGINT)
               AS n_embargo_tail,
             MIN(us) AS min_us, MAX(us) AS max_us
      FROM g GROUP BY fold ORDER BY fold"""))

  /** Per-group median imputation — the robust missing-value fill a
    * feature pipeline applies before training (mean imputation drags
    * toward the heavy tail the MAD/winsorize family exists to
    * resist). Missingness is DERIVED deterministically (vm % 97 = 0
    * on the micro-unit value, ~1% of rows) so both engines mask the
    * identical rows; the fill statistic is the per-event_type exact
    * median of the SURVIVORS.
    *
    * Exactness discipline (the outliers_mad precedent, plus one new
    * trick): values quantize to integer micro-units BEFORE the
    * median, so the interpolated median of two ints is an exact .5 —
    * and the gate then DOUBLES the units (`median2` = 2·median,
    * `total2` = 2·Σ) so every output crossing an aggregation boundary
    * is a BIGINT with the .5 gone: no double sum anywhere, hash-exact
    * at any SF (a double carry of Σ + n·(x+.5) stays exact only
    * below 2⁵³ — the ×2 trick removes the ceiling instead of
    * fencing it).
    *
    * Shape: two keyed aggregates over the (type, vm) stream with the
    * per-type median table BROADCAST back between them — the event
    * stream shuffles once on event_type, percentile state is
    * per-group, the final frame is type-cardinality-sized. At 100 TB
    * the drop-in scale path swaps the exact sort-based percentile for
    * percentile_approx (the winsorize_clip/winsorize_approx and
    * quantile_bins/quantile_bins_approx fence pairs price exactly
    * this swap; here the per-group buffers are bounded by the 5-type
    * cardinality today but group-cardinality-sensitive in general —
    * VERDICT-r10). */
  val impute_median = GQuery(
    "impute_median",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
        .select($"event_type",
          floor($"value" * 1000000d + 0.5d).cast("long").as("vm"))
        .withColumn("miss", $"vm" % 97 === 0L)
      val med = ev.filter(!$"miss")
        .groupBy($"event_type")
        .agg(expr("percentile(vm, 0.5D)").as("med"))
      ev.join(broadcast(med), "event_type")
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(when($"miss", 1L).otherwise(0L)).as("n_missing"),
          first(($"med" * 2d).cast("long")).as("median2_micro"),
          (sum(when($"miss", 0L).otherwise($"vm" * 2L)) +
            sum(when($"miss", ($"med" * 2d).cast("long"))
              .otherwise(0L))).as("total2_micro"))
        .orderBy($"event_type")
    },
    Some("""
      WITH ev AS (
        SELECT event_type,
               CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS vm
        FROM events),
      m AS (
        SELECT event_type,
               CAST(quantile_cont(vm, 0.5) * 2 AS BIGINT) AS med2
        FROM ev WHERE vm % 97 <> 0 GROUP BY event_type)
      SELECT ev.event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN vm % 97 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_missing,
             ANY_VALUE(med2) AS median2_micro,
             CAST(SUM(CASE WHEN vm % 97 = 0 THEN med2
                      ELSE vm * 2 END) AS BIGINT) AS total2_micro
      FROM ev JOIN m ON ev.event_type = m.event_type
      GROUP BY ev.event_type ORDER BY ev.event_type"""))

  // ------------------------------------------------------------ r10b
  /** Deterministic uniform k-per-group sample — the seed-free
    * reservoir: order each group by an md5 priority of the row key
    * (uniform over permutations, reproducible everywhere, no RNG
    * state) and keep the k = 100 lowest. Selection is VALUE-BLIND by
    * construction — the priority hashes only event_id — which is what
    * separates this from topk_per_group (top-k BY a value is a biased
    * sample; this one is exchangeable).
    *
    * Shape: rank-filter over a hash order, which Spark executes as
    * the two-phase WindowGroupLimit (per-partition top-k before the
    * exchange, k rows per mapper per group shuffle — the
    * topk_per_group plan pin applies verbatim): no group ever
    * materializes whole. sample_weighted owns the weighted variant;
    * this is its uniform floor. */
  val sample_reservoir = GQuery(
    "sample_reservoir",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      T.events(s, d)
        .select($"event_type", $"event_id",
          floor($"value" * 1000000d + 0.5d).cast("long").as("vm"),
          md5(concat($"event_id".cast("string"), lit(":r10")))
            .as("pri"))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"event_type").orderBy($"pri", $"event_id")))
        .filter($"rn" <= 100)
        .select($"event_type", $"rn", $"event_id", $"vm")
        .orderBy($"event_type", $"rn")
    },
    Some("""
      SELECT event_type, rn, event_id, vm FROM (
        SELECT event_type, event_id,
               CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS vm,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY event_type
                 ORDER BY md5(CAST(event_id AS VARCHAR) || ':r10'),
                          event_id) AS INT) AS rn
        FROM events)
      WHERE rn <= 100 ORDER BY event_type, rn"""))

  /** Equi-depth decile binning of lineitem prices — the discretizer a
    * feature pipeline runs before bucketized features / monotone
    * calibration: nine interior cutpoints from the exact interpolated
    * percentile, then a broadcast CASE-chain assignment (NOT an
    * array-lambda fold: HOF lambdas are CodegenFallback — the
    * phrase_query lesson — and the assignment is the per-row hot
    * path). Cutpoints quantize as floor(q·10 + 0.5): for p = k/10 the
    * interpolated value over integer cents is an exact multiple of
    * 0.1, so ×10 recovers the integer and the half-up floor only
    * absorbs double dust (the impute_median ×2 trick generalized to
    * deciles); bin(v) = #{cutpoints ≤ v} on the ×10 integer scale —
    * pure integer compares both engines.
    *
    * Scale posture: the exact percentile is the GATE-SIDE FENCE only —
    * its TypedImperative buffer materializes every value on one
    * reducer (keyless percentile = one buffer), a genuine 100 TB
    * scale-killer. The production path is [[quantile_bins_approx]]
    * (same CASE assignment over percentile_approx cutpoints), which
    * since r11 is its own gated row — the swap is PRICED, not
    * asserted (VERDICT-r10 item 2). */
  val quantile_bins = GQuery(
    "quantile_bins",
    (s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d)
        .select(floor($"l_extendedprice" * 100d + 0.5d).cast("long")
          .as("cents"))
      val cuts = li.agg(expr(
        "percentile(cents, array(0.1D,0.2D,0.3D,0.4D,0.5D," +
          "0.6D,0.7D,0.8D,0.9D))").as("q"))
        .select((1 to 9).map(i =>
          floor(element_at($"q", i) * 10d + 0.5d).cast("long")
            .as(s"c$i")): _*)
      val binned = li.crossJoin(broadcast(cuts))
        .withColumn("v10", $"cents" * 10L)
        .withColumn("bin", (1 to 9).map(i =>
          when($"v10" >= col(s"c$i"), 1L).otherwise(0L))
          .reduce(_ + _))
      binned.groupBy($"bin")
        .agg(count(lit(1)).as("n"), sum($"cents").as("cents_sum"))
        .orderBy($"bin")
    },
    Some("""
      WITH li AS (
        SELECT CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
          AS cents FROM lineitem),
      q AS (
        SELECT quantile_cont(cents,
          [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
        FROM li),
      cuts AS (
        SELECT CAST(FLOOR(qs[1] * 10 + 0.5) AS BIGINT) AS c1,
               CAST(FLOOR(qs[2] * 10 + 0.5) AS BIGINT) AS c2,
               CAST(FLOOR(qs[3] * 10 + 0.5) AS BIGINT) AS c3,
               CAST(FLOOR(qs[4] * 10 + 0.5) AS BIGINT) AS c4,
               CAST(FLOOR(qs[5] * 10 + 0.5) AS BIGINT) AS c5,
               CAST(FLOOR(qs[6] * 10 + 0.5) AS BIGINT) AS c6,
               CAST(FLOOR(qs[7] * 10 + 0.5) AS BIGINT) AS c7,
               CAST(FLOOR(qs[8] * 10 + 0.5) AS BIGINT) AS c8,
               CAST(FLOOR(qs[9] * 10 + 0.5) AS BIGINT) AS c9
        FROM q),
      binned AS (
        SELECT cents,
               (CASE WHEN cents * 10 >= c1 THEN 1 ELSE 0 END
                + CASE WHEN cents * 10 >= c2 THEN 1 ELSE 0 END
                + CASE WHEN cents * 10 >= c3 THEN 1 ELSE 0 END
                + CASE WHEN cents * 10 >= c4 THEN 1 ELSE 0 END
                + CASE WHEN cents * 10 >= c5 THEN 1 ELSE 0 END
                + CASE WHEN cents * 10 >= c6 THEN 1 ELSE 0 END
                + CASE WHEN cents * 10 >= c7 THEN 1 ELSE 0 END
                + CASE WHEN cents * 10 >= c8 THEN 1 ELSE 0 END
                + CASE WHEN cents * 10 >= c9 THEN 1 ELSE 0 END)
                 AS bin
        FROM li, cuts)
      SELECT CAST(bin AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS cents_sum
      FROM binned GROUP BY bin ORDER BY bin"""))

  /** The quantile_bins PRODUCTION path at 100 TB — decile cutpoints
    * from ONE `percentile_approx` sketch aggregate (Greenwald–Khanna,
    * accuracy 100: bounded buffer, map-side-mergeable partials)
    * instead of [[quantile_bins]]'s exact keyless percentile, whose
    * TypedImperative buffer materializes EVERY value on one reducer —
    * the genuine scale-killer VERDICT-r10 flagged as asserted-but-not-
    * priced. This row prices it: same discipline as
    * winsorize_clip/winsorize_approx, extended from one bound to the
    * full decile vector.
    *
    * The sketch's VALUES cannot cross engines, so the gate hashes
    * what IS invariant — GK's worst-case guarantee, as THEOREMS over
    * exact counts (ε = 1/accuracy):
    *   - `cut_in_contract(k)`: the returned cutpoint c_k has rank
    *     interval [count(< c_k)+1, count(≤ c_k)] intersecting
    *     [n(k/10 − ε), n(k/10 + ε)];
    *   - `occ_bounded(k)`: the OPEN-interval occupancy between
    *     consecutive cutpoints, count(c_k < v < c_{k+1}) =
    *     lt_{k+1} − le_k ≤ n(0.1 + 2ε) (each endpoint contributes ε;
    *     the open interval dodges tie mass, which no sketch bounds),
    *     and for k = 9 the tail fence n − le_9 ≤ n(0.1 + ε);
    *   - `cut_monotone(k)`: c_k ≤ c_{k+1} (a GK query for increasing
    *     ranks walks the same summary forward).
    * At verify SF the sketch genuinely approximates (n ≈ 60k ≫
    * accuracy = 100), so the contract is load-bearing, not vacuous.
    *
    * Shape: one sketch aggregate + one counting pass against the
    * broadcast 1-row cutpoint frame — no window, no per-reducer
    * value materialization; scan-floor at any SF. */
  val quantile_bins_approx = GQuery(
    "quantile_bins_approx",
    (s, d) => {
      import s.implicits._
      val acc = 100
      val eps = 1.0 / acc
      val li = T.lineitem(s, d)
        .select(floor($"l_extendedprice" * 100d + 0.5d).cast("long")
          .as("cents"))
      val cuts = li.agg(
        count(lit(1)).as("n"),
        percentile_approx($"cents",
          array((1 to 9).map(i => lit(i / 10.0)): _*), lit(acc))
          .as("q"))
      val sums = Seq(first($"n").as("n"), first($"q").as("q")) ++
        (1 to 9).flatMap(i => Seq(
          sum(when($"cents" < element_at($"q", i), 1L).otherwise(0L))
            .as(s"lt$i"),
          sum(when($"cents" <= element_at($"q", i), 1L).otherwise(0L))
            .as(s"le$i")))
      val counts = li.crossJoin(broadcast(cuts))
        .agg(sums.head, sums.tail: _*)
      val nD = $"n".cast("double")
      val rows = (1 to 9).map { i =>
        val q = i / 10.0
        val inC = col(s"lt$i").cast("double") <= nD * (q + eps) &&
          col(s"le$i").cast("double") >= nD * (q - eps)
        val occ =
          if (i < 9)
            (col(s"lt${i + 1}") - col(s"le$i")).cast("double") <=
              nD * (0.1 + 2 * eps)
          else ($"n" - col("le9")).cast("double") <= nD * (0.1 + eps)
        val mono =
          if (i < 9) element_at($"q", i) <= element_at($"q", i + 1)
          else lit(true)
        struct(lit(i.toLong).as("k"), inC.as("cut_in_contract"),
          occ.as("occ_bounded"), mono.as("cut_monotone"))
      }
      counts
        .select($"n", explode(array(rows: _*)).as("s"))
        .select($"s.k".as("k"), $"n", $"s.cut_in_contract",
          $"s.occ_bounded", $"s.cut_monotone")
        .orderBy($"k")
    },
    Some("""
      SELECT CAST(r.range AS BIGINT) AS k,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n,
             TRUE AS cut_in_contract,
             TRUE AS occ_bounded,
             TRUE AS cut_monotone
      FROM range(1, 10) r ORDER BY k"""))

  val all: Seq[GQuery] =
    Seq(chunk_windows, embed_quant_int8, embed_truncate,
      anonymize_ids, kanon_suppress,
      drift_chi2, fk_violations, source_cap, source_cap_agg, chunk_dedup,
      znorm_features, winsorize_clip, winsorize_approx,
      split_time_embargo, impute_median, sample_reservoir, quantile_bins,
      quantile_bins_approx)
}
