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
    * ordinality. */
  val chunk_windows = GQuery(
    "chunk_windows",
    (s, d) => {
      import s.implicits._
      T.documents(s, d)
        .withColumn("start",
          explode(sequence(lit(0L), $"n_chars" - 1L, lit(120L))))
        .select($"doc_id", ($"start" / 120L).cast("long").as("chunk_ix"),
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
           UNNEST(GENERATE_SERIES(0, d.n_chars - 1, 120)) AS t(s)
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

  val all: Seq[GQuery] =
    Seq(chunk_windows, embed_quant_int8, anonymize_ids, kanon_suppress)
}
