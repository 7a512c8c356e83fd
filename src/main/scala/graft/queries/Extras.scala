package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{GQuery, Tables => T}
import graft.operators.Multimodal

/** Sessionization, multidimensional aggregates, multimodal metadata,
  * and ML surface (rows-only where no deterministic SQL oracle can
  * exist).
  *
  * NB on time: events.ts is parquet TIMESTAMP(MICROS) → TIMESTAMP_NTZ
  * in Spark (the pre-r7 testdata was TIMESTAMP(NANOS) read as epoch-nano
  * longs). The session is UTC-pinned (GraftSession), so
  * `unix_micros(ts.cast("timestamp"))` is the exact epoch-µs long and
  * equals DuckDB's `epoch_us(ts)` — both engines see the identical
  * integer, no truncation step remains.
  */
object Extras {

  /** 30-minute-gap sessionization (batch analogue of the streaming
    * session window; reference A1's match-punctuation state is the same
    * shape). Pure window algebra: lag → gap flag → running session id. */
  val sessionize = GQuery(
    "sessionize",
    (s, d) => {
      import s.implicits._
      // window order is (epoch µs, event_id) on BOTH engines; us is an
      // exact integer reinterpretation of the µs-precision NTZ column
      // under the UTC-pinned session (header note)
      val wOrder = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      val gapUs = 30L * 60 * 1000 * 1000
      val sessions = T.events(s, d)
        .withColumn("us", unix_micros($"ts".cast("timestamp")))
        .withColumn("gap", $"us" - lag($"us", 1).over(wOrder))
        .withColumn("new_session",
          when($"gap".isNull || $"gap" > gapUs, 1L).otherwise(0L))
        .withColumn("session_id",
          sum($"new_session").over(
            wOrder.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sessions
        .groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_sessions"),
          max($"n_events").as("max_session_events"),
          sum($"n_events").as("n_events"))
        .orderBy($"user_id")
    },
    Some("""
      WITH g AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER
                 (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                 AS gap
        FROM events),
      s AS (
        SELECT user_id,
               SUM(CASE WHEN gap IS NULL OR gap > 1800000000
                        THEN 1 ELSE 0 END) OVER
                 (PARTITION BY user_id ORDER BY us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_id
        FROM g),
      per_session AS (
        SELECT user_id, session_id, COUNT(*) AS n_events
        FROM s GROUP BY user_id, session_id)
      SELECT user_id, COUNT(*) AS n_sessions,
             MAX(n_events) AS max_session_events,
             CAST(SUM(n_events) AS BIGINT) AS n_events
      FROM per_session GROUP BY user_id ORDER BY user_id"""))

  /** Gaps-and-islands → SCD2-style validity intervals: consecutive
    * same-type events per user collapse into (type, valid_from,
    * valid_to, n_events) intervals — the standard derivation of a
    * type-2 slowly-changing dimension from a change log, and the
    * VALUE-change twin of [[sessionize]]'s TIME-gap islands. Same
    * deterministic discipline: exact epoch-µs longs, (us, event_id)
    * window order on both engines, island ordinal from a running sum
    * of change flags. One keyed sort window + one keyed aggregation —
    * partition-parallel over users, per-key cost ∝ that user's
    * history, no global window anywhere. */
  val scd2_islands = GQuery(
    "scd2_islands",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      T.events(s, d)
        .withColumn("us", unix_micros($"ts".cast("timestamp")))
        .withColumn("chg",
          when(lag($"event_type", 1).over(w).isNull ||
            lag($"event_type", 1).over(w) =!= $"event_type", 1L)
            .otherwise(0L))
        .withColumn("island", sum($"chg").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"island", $"event_type")
        .agg(min($"us").as("valid_from_us"),
          max($"us").as("valid_to_us"),
          count(lit(1)).as("n_events"))
        .select($"user_id", $"island", $"event_type",
          $"valid_from_us", $"valid_to_us", $"n_events")
        .orderBy($"user_id", $"island")
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_type, event_id, epoch_us(ts) AS us
        FROM events),
      f AS (
        SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
                         OR lag(event_type) OVER w <> event_type
                       THEN 1 ELSE 0 END AS chg
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      i AS (
        SELECT *, SUM(chg) OVER (PARTITION BY user_id
          ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS island
        FROM f)
      SELECT user_id, CAST(island AS BIGINT) AS island, event_type,
             MIN(us) AS valid_from_us, MAX(us) AS valid_to_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM i GROUP BY user_id, island, event_type
      ORDER BY user_id, island"""))

  /** Parquet schema evolution on read: a table written by two writer
    * "eras" — the old era lacks the `source` column — read back as one
    * frame with `mergeSchema`, era-1 rows NULL-filled for the column
    * they predate. This is the source-layer contract a growing corpus
    * depends on (columns accrete over time; history is never
    * rewritten). The oracle rebuilds the same counts from the original
    * table using the era-split rule, so the hash proves merge-on-read
    * semantics: n_legacy counts rows whose file HAS NO source column,
    * via `source IS NULL` over the merged frame. */
  val schema_evolution = GQuery(
    "schema_evolution",
    (s, d) => graft.GQuery.withTempTable(s, "graft-schema-evo") { t =>
      import s.implicits._
      val docs = T.documents(s, d)
      docs.filter($"doc_id" % 2 === 0).select($"doc_id", $"lang")
        .write.mode("append").parquet(s"$t/tbl")
      docs.filter($"doc_id" % 2 === 1)
        .select($"doc_id", $"lang", $"source")
        .write.mode("append").parquet(s"$t/tbl")
      s.read.option("mergeSchema", "true").parquet(s"$t/tbl")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"source".isNull, 1L).otherwise(0L)).as("n_legacy"),
          count($"source").as("n_with_source"))
        .orderBy($"lang")
    },
    Some("""
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_legacy,
             CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_with_source
      FROM documents GROUP BY lang ORDER BY lang"""))

  /** Snapshot reconciliation (table diff): planted drops (deleted),
    * text edits (modified), and key-shifted copies (added) against the
    * original table must come back as exactly the planted change set.
    * The 100 TB shape: ONE co-partitioned full-outer join on the key,
    * comparing per-row MD5 fingerprints instead of full rows — the
    * wide payload never rides the shuffle twice, and unchanged rows
    * (the overwhelming majority in a real reconciliation) are filtered
    * before the output sort. Deletion wins over modification when a
    * row is planted with both (it is absent from the new side), and
    * added rows derive from the ORIGINAL text — both encoded
    * identically in the oracle's reconstruction. */
  val table_diff = GQuery(
    "table_diff",
    (s, d) => {
      import s.implicits._
      val base = T.documents(s, d).select($"doc_id", $"text", $"lang")
      val newT = base.filter(!($"doc_id" % 11 === 5))
        .withColumn("text",
          when($"doc_id" % 9 === 2, concat($"text", lit(" v2")))
            .otherwise($"text"))
        .unionByName(base.filter($"doc_id" % 17 === 4)
          .select(($"doc_id" + 20000000L).as("doc_id"), $"text", $"lang"))
      def fp(df: org.apache.spark.sql.DataFrame, as: String) =
        df.select($"doc_id",
          md5(concat_ws("\u0001", $"text", $"lang")).as(as))
      fp(base, "h_old").join(fp(newT, "h_new"), Seq("doc_id"), "full_outer")
        .select($"doc_id",
          when($"h_old".isNull, "added")
            .when($"h_new".isNull, "deleted")
            .when($"h_old" =!= $"h_new", "modified")
            .as("change"))
        .filter($"change".isNotNull)
        .orderBy($"doc_id")
    },
    Some("""
      WITH base AS (SELECT doc_id, text, lang FROM documents),
      newt AS (
        SELECT doc_id,
               CASE WHEN doc_id % 9 = 2 THEN text || ' v2' ELSE text END
                 AS text,
               lang
        FROM base WHERE doc_id % 11 <> 5
        UNION ALL
        SELECT doc_id + 20000000, text, lang
        FROM base WHERE doc_id % 17 = 4),
      o AS (SELECT doc_id, md5(concat_ws(chr(1), text, lang)) AS h_old
            FROM base),
      n AS (SELECT doc_id, md5(concat_ws(chr(1), text, lang)) AS h_new
            FROM newt),
      j AS (
        SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'deleted'
                    WHEN h_old <> h_new THEN 'modified' END AS change
        FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
      SELECT doc_id, change FROM j WHERE change IS NOT NULL
      ORDER BY doc_id"""))

  /** PERMISSIVE corrupt-record routing on a JSON source: a JSONL file
    * is written with a syntactically-truncated line planted for every
    * doc_id ≡ 0 mod 13, read back with an explicit schema +
    * `columnNameOfCorruptRecord`, and the report proves Spark routed
    * exactly the planted lines — corrupt rows surface with all schema
    * fields null and the RAW line preserved, so the corrupt bucket's
    * byte count is checkable against the oracle's reconstruction of
    * the identical truncated string. One scan: good-row aggregates
    * and the corrupt bucket come out of a single groupBy over
    * `coalesce(lang, '_corrupt')` (also why this never trips Spark's
    * corrupt-column-only query restriction). At 100 TB this is the
    * difference between a pipeline that dies on the first bad byte
    * and one that quarantines it with evidence. */
  val json_corrupt_routing = GQuery(
    "json_corrupt_routing",
    (s, d) => graft.GQuery.withTempTable(s, "graft-json-corrupt") { t =>
      import s.implicits._
      val docs = T.documents(s, d)
      val good = docs.filter($"doc_id" % 13 =!= 0)
        .select(to_json(struct($"doc_id", $"lang", $"n_chars"))
          .as("value"))
      val bad = docs.filter($"doc_id" % 13 === 0)
        .select(concat(lit("{\"doc_id\": "), $"doc_id",
          lit(", \"lang\": \"xx")).as("value"))
      good.unionByName(bad).write.text(s"$t/jsonl")
      s.read
        .schema("doc_id LONG, lang STRING, n_chars LONG, " +
          "_corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(s"$t/jsonl")
        .groupBy(coalesce($"lang", lit("_corrupt")).as("lang"))
        .agg(count(lit(1)).as("n_rows"),
          sum(coalesce($"n_chars",
            length($"_corrupt_record").cast("long"))).as("chars"))
        .orderBy($"lang")
    },
    Some("""
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(n_chars) AS BIGINT) AS chars
      FROM documents WHERE doc_id % 13 <> 0 GROUP BY lang
      UNION ALL
      SELECT '_corrupt', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(length('{"doc_id": ' || doc_id ||
               ', "lang": "xx')) AS BIGINT)
      FROM documents WHERE doc_id % 13 = 0
      ORDER BY lang"""))

  /** Time-series resampling + forward fill: each user's event stream
    * becomes a dense hourly grid between their first and last
    * observation, gaps carry the last observed value forward (LOCF —
    * the standard feature-store/training-snapshot densification).
    * Spark-first shape — no join anywhere: the grid is
    * `sequence`+`explode` off a keyed min/max (never a driver loop or
    * a calendar cross join), the last-obs-per-hour pick is a `max_by`
    * aggregate with map-side partials (the struct ordering key demotes
    * it to SortAggregate — profile_columns' buffer lesson — but the
    * partial agg still collapses each task's events to one row per
    * (user,hour) BEFORE the exchange, where a row_number window would
    * ship every event), and obs ∪ grid rows flow through ONE
    * user-partitioned window ordered by (h, pri) with obs rows
    * sorting immediately before their grid hour: the LOCF fill is
    * `last(ignoreNulls)`, and `is_observed` falls out of `lag(h)` on
    * the same window (the only row that can precede a grid row at its
    * own hour is that hour's single obs row). The join spelling this
    * replaces paid an extra (user,h) exchange of the grid plus the
    * join itself.
    * At 100 TB the grid grows with user-hours (MkScale's decade
    * extends the SPAN, so output scales linearly with input — priced
    * in the sweep). Values are copied, never computed, so doubles
    * hash exactly; the per-hour pick tie-breaks on (us, event_id)
    * on BOTH engines. A user's first grid hour is their first
    * observation's hour, so the fill never sees a leading null. */
  val resample_ffill = GQuery(
    "resample_ffill",
    (s, d) => {
      import s.implicits._
      val hourUs = 3600L * 1000 * 1000
      val ev = T.events(s, d)
        .withColumn("us", unix_micros($"ts".cast("timestamp")))
        .withColumn("h", expr(s"us DIV $hourUs"))
      val obs = ev.groupBy($"user_id", $"h")
        .agg(max_by($"value", struct($"us", $"event_id")).as("obs_v"))
        .select($"user_id", $"h", $"obs_v", lit(0).as("pri"))
      val grid = ev.groupBy($"user_id")
        .agg(min($"h").as("hmin"), max($"h").as("hmax"))
        .select($"user_id", explode(sequence($"hmin", $"hmax")).as("h"),
          lit(null).cast("double").as("obs_v"), lit(1).as("pri"))
      val w = Window.partitionBy($"user_id").orderBy($"h", $"pri")
      val fill = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      obs.unionByName(grid)
        .withColumn("v", last($"obs_v", ignoreNulls = true).over(fill))
        .withColumn("prev_h", lag($"h", 1).over(w))
        .filter($"pri" === 1)
        .select($"user_id", $"h", $"v",
          ($"prev_h" <=> $"h").as("is_observed"))
        .orderBy($"user_id", $"h")
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_id, value, epoch_us(ts) AS us,
               epoch_us(ts) // 3600000000 AS h
        FROM events),
      b AS (SELECT user_id, MIN(h) AS hmin, MAX(h) AS hmax
            FROM e GROUP BY user_id),
      grid AS (SELECT user_id, UNNEST(generate_series(hmin, hmax)) AS h
               FROM b),
      obs AS (
        SELECT user_id, h, value AS obs_v FROM (
          SELECT user_id, h, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id, h
                   ORDER BY us DESC, event_id DESC) AS rn
          FROM e)
        WHERE rn = 1)
      SELECT g.user_id, g.h,
             LAST_VALUE(o.obs_v IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v,
             o.obs_v IS NOT NULL AS is_observed
      FROM grid g LEFT JOIN obs o
        ON g.user_id = o.user_id AND g.h = o.h
      ORDER BY g.user_id, g.h"""))

  /** Linear-interpolation resampling — the other half of
    * [[resample_ffill]]'s densification pair (LOCF holds the last
    * value; interpolation draws the line between bracketing
    * observations — the time-series-features default). Same hourly
    * grid per user over [first, last] observed hour (both endpoints
    * observed by construction, so every grid point has a bracket).
    * Plan: one keyed aggregate collapses each (user, hour) to its
    * last observation, the grid LEFT-joins the observations, and two
    * RUNNING keyed windows carry (h, v) of the previous and next
    * observation. The "next" carry is deliberately spelled as a
    * REVERSED-order running frame (ORDER BY h DESC, [unbounded
    * preceding, current]) and NOT as [current, unbounded following]:
    * Spark's UnboundedFollowingWindowFunctionFrame re-aggregates the
    * entire remaining frame for EVERY row — O(n²) per key — and the
    * first spelling of this query sat single-threaded for 20+ minutes
    * at sf0.1 inside that frame (jstack: AggregateProcessor.update
    * under UnboundedFollowingWindowFunctionFrame.write) where the
    * running form is the same one-pass incremental carry the LOCF
    * window gets. Interpolation then needs no self-join and no second
    * pass; output-bound like ffill (user-hours).
    * Determinism: the fraction (h−hp)/(hn−hp) is an exact-integer
    * difference cast to double, and v = vp + (vn−vp)·frac is ONE
    * identical IEEE tree on both engines (division and each op
    * correctly rounded) — observed rows short-circuit through the
    * hp = hn guard to the exact stored value, so no float wobble
    * exists anywhere for the hash gate to see. */
  val resample_interp = GQuery(
    "resample_interp",
    (s, d) => {
      import s.implicits._
      val hourUs = 3600L * 1000 * 1000
      val ev = T.events(s, d)
        .withColumn("us", unix_micros($"ts".cast("timestamp")))
        .withColumn("h", expr(s"us DIV $hourUs"))
      val obs = ev.groupBy($"user_id", $"h")
        .agg(max_by($"value", struct($"us", $"event_id")).as("obs_v"))
        .select($"user_id", $"h".as("oh"), $"obs_v")
      val grid = ev.groupBy($"user_id")
        .agg(min($"h").as("hmin"), max($"h").as("hmax"))
        .select($"user_id", explode(sequence($"hmin", $"hmax")).as("h"))
      val wp = Window.partitionBy($"user_id").orderBy($"h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // running frame over DESCENDING h == "first following" without
      // the quadratic UnboundedFollowing frame (scaladoc)
      val wn = Window.partitionBy($"user_id").orderBy($"h".desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(obs, grid("user_id") === obs("user_id") &&
          grid("h") === obs("oh"), "left")
        .select(grid("user_id"), grid("h"), $"obs_v")
        .withColumn("hp", last(when($"obs_v".isNotNull, $"h"),
          ignoreNulls = true).over(wp))
        .withColumn("vp", last($"obs_v", ignoreNulls = true).over(wp))
        .withColumn("hn", last(when($"obs_v".isNotNull, $"h"),
          ignoreNulls = true).over(wn))
        .withColumn("vn", last($"obs_v", ignoreNulls = true).over(wn))
        .withColumn("v",
          when($"hn".isNull, $"vp")
            .when($"hp".isNull, $"vn")
            .when($"hn" === $"hp", $"vp")
            .otherwise($"vp" + ($"vn" - $"vp") *
              (($"h" - $"hp").cast("double") /
               ($"hn" - $"hp").cast("double"))))
        .select($"user_id", $"h", $"v", $"obs_v".isNotNull.as("is_observed"))
        .orderBy($"user_id", $"h")
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_id, value, epoch_us(ts) AS us,
               epoch_us(ts) // 3600000000 AS h
        FROM events),
      b AS (SELECT user_id, MIN(h) AS hmin, MAX(h) AS hmax
            FROM e GROUP BY user_id),
      grid AS (SELECT user_id, UNNEST(generate_series(hmin, hmax)) AS h
               FROM b),
      obs AS (
        SELECT user_id, h AS oh, value AS obs_v FROM (
          SELECT user_id, h, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id, h
                   ORDER BY us DESC, event_id DESC) AS rn
          FROM e)
        WHERE rn = 1),
      j AS (
        SELECT g.user_id, g.h, o.obs_v
        FROM grid g LEFT JOIN obs o
          ON g.user_id = o.user_id AND g.h = o.oh),
      f AS (
        SELECT user_id, h, obs_v,
               LAST_VALUE(CASE WHEN obs_v IS NOT NULL THEN h END
                 IGNORE NULLS) OVER wp AS hp,
               LAST_VALUE(obs_v IGNORE NULLS) OVER wp AS vp,
               FIRST_VALUE(CASE WHEN obs_v IS NOT NULL THEN h END
                 IGNORE NULLS) OVER wn AS hn,
               FIRST_VALUE(obs_v IGNORE NULLS) OVER wn AS vn
        FROM j
        WINDOW wp AS (PARTITION BY user_id ORDER BY h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY user_id ORDER BY h
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT user_id, h,
             CASE WHEN hn IS NULL THEN vp
                  WHEN hp IS NULL THEN vn
                  WHEN hn = hp THEN vp
                  ELSE vp + (vn - vp) *
                       (CAST(h - hp AS DOUBLE) / CAST(hn - hp AS DOUBLE))
             END AS v,
             obs_v IS NOT NULL AS is_observed
      FROM f ORDER BY user_id, h"""))

  /** Exact mode per group with a total tie-break (most frequent
    * l_quantity per return flag; ties go to the SMALLEST value, so
    * the result is a function of the data, not the plan). Two keyed
    * hash aggregates — value-count then argmax by the (count, −value)
    * struct order — both map-side combinable; no window, no sort of
    * the value domain. The oracle takes the row_number spelling. */
  val agg_mode = GQuery(
    "agg_mode",
    (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .select($"l_returnflag", $"l_quantity".cast("long").as("qty"))
        .groupBy($"l_returnflag", $"qty")
        .agg(count(lit(1)).as("n"))
        .groupBy($"l_returnflag")
        .agg(max_by($"qty", struct($"n", -$"qty")).as("mode_qty"),
          max($"n").as("n_mode"),
          count(lit(1)).as("n_distinct"))
        .orderBy($"l_returnflag")
    },
    Some("""
      WITH c AS (
        SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem GROUP BY 1, 2),
      r AS (
        SELECT l_returnflag, qty, n,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY n DESC, qty ASC) AS rk
        FROM c),
      d AS (
        SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_distinct,
               MAX(n) AS n_mode
        FROM c GROUP BY 1)
      SELECT r.l_returnflag, r.qty AS mode_qty, d.n_mode, d.n_distinct
      FROM r JOIN d ON r.l_returnflag = d.l_returnflag
      WHERE r.rk = 1 ORDER BY r.l_returnflag"""))

  /** CUBE multidimensional aggregate (SURVEY §2.5 "free in Spark SQL"
    * row, made concrete). */
  val agg_cube = GQuery(
    "agg_cube",
    (s, d) => {
      import s.implicits._
      T.events(s, d)
        .withColumn("cohort", ($"user_id" % 2).cast("int"))
        .cube($"event_type", $"cohort")
        .agg(count(lit(1)).as("n"))
        .select(coalesce($"event_type", lit("ALL")).as("event_type"),
          coalesce($"cohort", lit(-1)).as("cohort"), $"n")
        .orderBy($"event_type", $"cohort")
    },
    Some("""
      SELECT COALESCE(event_type, 'ALL') AS event_type,
             COALESCE(cohort, -1) AS cohort, COUNT(*) AS n
      FROM (SELECT event_type, CAST(user_id % 2 AS INT) AS cohort
            FROM events)
      GROUP BY CUBE(event_type, cohort)
      ORDER BY event_type, cohort"""))

  /** Multimodal metadata over binary payloads (payload = utf-8 text via
    * Multimodal.fromText; byte length + sha256 digest cross-checked). */
  val mm_binary_meta = GQuery(
    "mm_binary_meta",
    (s, d) => {
      import s.implicits._
      Multimodal.fromText(T.documents(s, d), "doc_id", "text")
        .select($"media_id", $"modality",
          octet_length($"payload").as("n_bytes"),
          sha2($"payload", 256).as("sha256"))
        .orderBy($"media_id")
    },
    Some("""
      SELECT doc_id AS media_id, 'image' AS modality,
             CAST(octet_length(encode(text)) AS INT) AS n_bytes,
             sha256(text) AS sha256
      FROM documents ORDER BY media_id"""))

  /** Per-partition decode + feature extraction over REAL binary-PPM
    * payloads (Multimodal.toPpm synthesizes a decodable image per
    * document; PpmCodec genuinely parses the header grammar and raster).
    * The decoded width/height/pixel-count and the exact pixel byte sum
    * are oracle-checked — the oracle rebuilds the raster arithmetic
    * (pixel j = (7j + 13·id) mod 256) with a range() join. Channel-mean
    * feature floats are pinned in MultimodalSpec. */
  val mm_feature_extract = GQuery(
    "mm_feature_extract",
    (s, d) => {
      import s.implicits._
      Multimodal.extractFeatures(
          Multimodal.toPpm(T.documents(s, d), "doc_id", "text"))
        .select($"media_id", $"n_bytes", $"width", $"height",
          $"n_pixels", $"pixel_sum")
        .orderBy($"media_id")
    },
    Some("""
      WITH c AS (
        SELECT doc_id AS media_id,
               CAST(8 + doc_id % 8 AS BIGINT) AS w,
               CAST(8 + octet_length(encode(text)) % 5 AS BIGINT) AS h,
               13 * doc_id AS seed
        FROM documents)
      SELECT c.media_id,
             CAST(9 + length(CAST(MIN(c.w) AS VARCHAR))
                    + length(CAST(MIN(c.h) AS VARCHAR))
                    + 3 * MIN(c.w) * MIN(c.h) AS INT) AS n_bytes,
             CAST(MIN(c.w) AS INT) AS width,
             CAST(MIN(c.h) AS INT) AS height,
             MIN(c.w) * MIN(c.h) AS n_pixels,
             CAST(SUM((7 * j.range + c.seed) % 256) AS BIGINT) AS pixel_sum
      FROM c, range(540) j
      WHERE j.range < 3 * c.w * c.h
      GROUP BY c.media_id ORDER BY media_id"""))

  /** Frame sampling over the DECODED raster: frame f = pixel row
    * f·h/4, emitted with its 3·w bytes and exact checksum — the
    * even-spacing row selection and the per-row byte sum are both
    * oracle-rebuilt from the raster arithmetic. */
  val mm_frame_sample = GQuery(
    "mm_frame_sample",
    (s, d) => {
      import s.implicits._
      Multimodal.sampleFrames(
          Multimodal.toPpm(T.documents(s, d), "doc_id", "text"),
          frames = 4)
        .select($"media_id", $"frame_idx", $"row_idx", $"n_bytes",
          $"checksum")
        .orderBy($"media_id", $"frame_idx")
    },
    Some("""
      WITH c AS (
        SELECT doc_id AS media_id,
               CAST(8 + doc_id % 8 AS BIGINT) AS w,
               CAST(8 + octet_length(encode(text)) % 5 AS BIGINT) AS h,
               13 * doc_id AS seed
        FROM documents),
      f AS (SELECT CAST(range AS BIGINT) AS fi FROM range(4))
      SELECT c.media_id, CAST(f.fi AS INT) AS frame_idx,
             CAST((f.fi * MIN(c.h)) // 4 AS INT) AS row_idx,
             CAST(3 * MIN(c.w) AS INT) AS n_bytes,
             CAST(SUM((7 * (3 * ((f.fi * c.h) // 4) * c.w + j.range)
                       + c.seed) % 256) AS BIGINT) AS checksum
      FROM c, f, range(45) j
      WHERE j.range < 3 * c.w
      GROUP BY c.media_id, f.fi
      ORDER BY media_id, frame_idx"""))

  /** Real nearest-neighbor resize on the decoded raster to 8×8: target
    * (x, y) samples source (x·w/8, y·h/8); the oracle recomputes every
    * sampled pixel's arithmetic value and checks the output checksum —
    * a wrong stride, axis swap, or channel interleave all break it. */
  val mm_resize = GQuery(
    "mm_resize",
    (s, d) => {
      import s.implicits._
      Multimodal.resize(
          Multimodal.toPpm(T.documents(s, d), "doc_id", "text"),
          w = 8, h = 8)
        .select($"media_id", $"out_w", $"out_h",
          octet_length($"resized").as("n_bytes"), $"checksum")
        .orderBy($"media_id")
    },
    Some("""
      WITH c AS (
        SELECT doc_id AS media_id,
               CAST(8 + doc_id % 8 AS BIGINT) AS w,
               CAST(8 + octet_length(encode(text)) % 5 AS BIGINT) AS h,
               13 * doc_id AS seed
        FROM documents)
      SELECT c.media_id, 8 AS out_w, 8 AS out_h, 192 AS n_bytes,
             CAST(SUM((7 * (3 * ((((g.range // 8) * c.h) // 8) * c.w
                                 + (((g.range % 8) * c.w) // 8))
                            + ch.range)
                       + c.seed) % 256) AS BIGINT) AS checksum
      FROM c, range(64) g, range(3) ch
      GROUP BY c.media_id ORDER BY media_id"""))

  /** Audio metadata + amplitude features over REAL RIFF/WAVE PCM
    * payloads (Multimodal.toWav synthesizes a decodable 16-bit WAV per
    * document; WavCodec genuinely walks the chunk grammar). Decoded
    * geometry (channels/rate/frame count), the 44-byte-header size
    * arithmetic, integer-division duration, and the exact Σ|sample|
    * amplitude sum are all oracle-rebuilt — a wrong byte order,
    * channel interleave, or sign convention breaks the hash. */
  val mm_audio_meta = GQuery(
    "mm_audio_meta",
    (s, d) => {
      import s.implicits._
      Multimodal.extractAudioFeatures(
          Multimodal.toWav(T.documents(s, d), "doc_id", "text"))
        .select($"media_id", $"n_bytes", $"channels", $"sample_rate",
          $"n_frames", $"duration_ms", $"amp_sum")
        .orderBy($"media_id")
    },
    Some("""
      WITH c AS (
        SELECT doc_id AS media_id,
               CAST(1 + doc_id % 2 AS BIGINT) AS ch,
               CAST(8000 * (1 + doc_id % 3) AS BIGINT) AS sr,
               CAST(64 + octet_length(encode(text)) % 32 AS BIGINT)
                 AS frames,
               13 * doc_id AS seed
        FROM documents)
      SELECT c.media_id,
             CAST(44 + 2 * MIN(c.frames) * MIN(c.ch) AS INT) AS n_bytes,
             CAST(MIN(c.ch) AS INT) AS channels,
             CAST(MIN(c.sr) AS INT) AS sample_rate,
             MIN(c.frames) AS n_frames,
             MIN(c.frames) * 1000 // MIN(c.sr) AS duration_ms,
             CAST(SUM(ABS(((31 * j.range + c.seed) % 65536) - 32768))
               AS BIGINT) AS amp_sum
      FROM c, range(190) j
      WHERE j.range < c.frames * c.ch
      GROUP BY c.media_id ORDER BY media_id"""))

  /** Decimating audio downsample (keep channel 0 of every 4th frame)
    * on the decoded PCM — the kept-frame count, halved-rate metadata,
    * output byte length, and Σ|sample| checksum of exactly the
    * retained samples are oracle-rebuilt from the synthesis
    * arithmetic (sample index of frame f, channel 0 = f·channels). */
  val mm_audio_downsample = GQuery(
    "mm_audio_downsample",
    (s, d) => {
      import s.implicits._
      Multimodal.downsampleAudio(
          Multimodal.toWav(T.documents(s, d), "doc_id", "text"),
          factor = 4)
        .select($"media_id", $"out_rate", $"n_kept",
          octet_length($"mono").as("n_bytes"), $"checksum")
        .orderBy($"media_id")
    },
    Some("""
      WITH c AS (
        SELECT doc_id AS media_id,
               CAST(1 + doc_id % 2 AS BIGINT) AS ch,
               CAST(8000 * (1 + doc_id % 3) AS BIGINT) AS sr,
               CAST(64 + octet_length(encode(text)) % 32 AS BIGINT)
                 AS frames,
               13 * doc_id AS seed
        FROM documents)
      SELECT c.media_id,
             CAST(MIN(c.sr) // 4 AS INT) AS out_rate,
             (MIN(c.frames) + 3) // 4 AS n_kept,
             CAST(2 * ((MIN(c.frames) + 3) // 4) AS INT) AS n_bytes,
             CAST(SUM(ABS(((31 * (f.range * c.ch) + c.seed) % 65536)
                          - 32768)) AS BIGINT) AS checksum
      FROM c, range(95) f
      WHERE f.range < c.frames AND f.range % 4 = 0
      GROUP BY c.media_id ORDER BY media_id"""))

  /** DuckDB spelling of the audio energy-profile hash over a
    * parameterized clip catalog CTE `c(id, ch, frames, seed)` — the
    * PCM synthesis arithmetic rebuilt relationally (the phashSql
    * discipline on the audio axis): channel-0 CHIRP sample of frame
    * f = ((31·(f·ch)² + seed) mod 65536) − 32768 (toWavChirp — the
    * toWav ramp is degenerate for fingerprints), window k = f·64 DIV
    * frames, bit = mean comparison cross-multiplied
    * (e·frames ≥ Σe·cnt), bands = 16-bit packs. range(95) covers the
    * max frame count (64 + len%32 ≤ 95, the mm_audio_downsample
    * bound). */
  /** `p` prefixes every CTE name (see [[phashSql]]). */
  private def audioHashSql(catalogCte: String, p: String = ""): String = s"""
      WITH ${p}c AS ($catalogCte),
      ${p}fr AS (
        SELECT id, frames, (f.range * 64) // frames AS k,
               ABS(((31 * (f.range * ch) * (f.range * ch) + seed)
                     % 65536) - 32768) AS av
        FROM ${p}c, range(95) f WHERE f.range < frames),
      ${p}win AS (
        SELECT id, frames, k, CAST(SUM(av) AS BIGINT) AS e,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM ${p}fr GROUP BY id, frames, k),
      ${p}tot AS (SELECT id, CAST(SUM(e) AS BIGINT) AS t
              FROM ${p}win GROUP BY id),
      ${p}bits AS (
        SELECT w.id, w.k,
               CASE WHEN w.e * w.frames >= ${p}tot.t * w.cnt
                    THEN 1 ELSE 0 END AS bit
        FROM ${p}win w JOIN ${p}tot ON w.id = ${p}tot.id),
      ${p}bandv AS (
        SELECT id, k // 16 AS bk,
               CAST(SUM((CAST(1 AS BIGINT) << (k % 16)) * bit)
                 AS BIGINT) AS bv
        FROM ${p}bits GROUP BY id, k // 16)"""

  private val audioCatalog = """
        SELECT doc_id AS id,
               CAST(1 + doc_id % 2 AS BIGINT) AS ch,
               CAST(64 + octet_length(encode(text)) % 32 AS BIGINT)
                 AS frames,
               13 * doc_id AS seed
        FROM documents"""

  /** Per-clip 64-bit energy-profile hash through the REAL WAVE decode
    * path ([[Multimodal.audioHash]]) — the mm_phash discipline on the
    * audio axis: real codec on the Spark side, pure-SQL PCM rebuild
    * on the oracle side, one fingerprint per clip that must agree
    * bit-for-bit. The bit is a cross-multiplied MEAN comparison
    * (windows hold unequal frame counts when nFrames isn't a multiple
    * of 64), gain-invariant by the same algebra as aHash's
    * brightness-shift invariance. Scan-bound: one decode per clip, no
    * shuffle before the per-clip hash row. */
  val mm_audio_hash = GQuery(
    "mm_audio_hash",
    (s, d) => {
      import s.implicits._
      Multimodal.audioHash(
          Multimodal.toWavChirp(T.documents(s, d), "doc_id", "text"))
        .select($"media_id", $"n_frames",
          ($"b1" * 65536L + $"b0").as("hash_lo"),
          ($"b3" * 65536L + $"b2").as("hash_hi"), $"n_ones")
        .orderBy($"media_id")
    },
    Some(audioHashSql(audioCatalog) + """
      , hash AS (
        SELECT id,
               CAST(SUM(CASE WHEN bk < 2
                 THEN bv * (CAST(1 AS BIGINT) << (bk * 16))
                 ELSE 0 END) AS BIGINT) AS hash_lo,
               CAST(SUM(CASE WHEN bk >= 2
                 THEN bv * (CAST(1 AS BIGINT) << ((bk - 2) * 16))
                 ELSE 0 END) AS BIGINT) AS hash_hi
        FROM bandv GROUP BY id),
      ones AS (
        SELECT id, CAST(SUM(bit) AS BIGINT) AS n_ones
        FROM bits GROUP BY id)
      SELECT c.id AS media_id, c.frames AS n_frames, hash_lo, hash_hi,
             n_ones
      FROM c JOIN hash ON c.id = hash.id
             JOIN ones ON c.id = ones.id
      ORDER BY media_id"""))

  /** Audio near-dup classes at Hamming ≤ 3 — the
    * [[mm_dedup_phash_canonical]] production shape applied DIRECTLY
    * to the audio fingerprint (the image family's saturation fence
    * already priced why exact pair enumeration dies: this family goes
    * straight to the linear representation). Exact-hash classes
    * collapse first (canonical = min id, n = class size; every 10th
    * clip plants a byte-identical twin under −id−1 — the re-upload
    * case — guaranteeing fat classes), the pigeonhole-lossless banded
    * join runs over the class table, and self/cross pair_mass rows
    * carry the full pair information linearly. Oracle brute-forces
    * all class pairs — two algorithms, one answer. */
  val mm_dedup_audio_canonical = GQuery(
    "mm_dedup_audio_canonical",
    (s, d) => {
      import s.implicits._
      val media =
        Multimodal.toWavChirp(T.documents(s, d), "doc_id", "text")
      val plants = media.filter($"media_id" % 10 === 0L)
        .withColumn("media_id", -$"media_id" - 1L)
      val classes = Multimodal.audioHash(media.unionByName(plants))
        .groupBy($"b0", $"b1", $"b2", $"b3")
        .agg(min($"media_id").as("canon"), count(lit(1)).as("n"))
        .localCheckpoint()
      val bands = classes.select($"canon",
        posexplode(array($"b0", $"b1", $"b2", $"b3")).as(Seq("bk", "bv")))
      val cand = bands.alias("a").join(bands.alias("b"),
          col("a.bk") === col("b.bk") && col("a.bv") === col("b.bv") &&
            col("a.canon") < col("b.canon"))
        .select(col("a.canon").as("c1"), col("b.canon").as("c2"))
        .distinct()
      val hx = classes.select($"canon", $"b0", $"b1", $"b2", $"b3", $"n")
      val cross = cand
        .join(hx.toDF("c1", "a0", "a1", "a2", "a3", "n1"), "c1")
        .join(hx.toDF("c2", "x0", "x1", "x2", "x3", "n2"), "c2")
        .select($"c1", $"c2",
          (bit_count($"a0".bitwiseXOR($"x0")) +
            bit_count($"a1".bitwiseXOR($"x1")) +
            bit_count($"a2".bitwiseXOR($"x2")) +
            bit_count($"a3".bitwiseXOR($"x3"))).cast("long")
            .as("hamming"),
          ($"n1" * $"n2").as("pair_mass"))
        .filter($"hamming" <= 3L)
      val self = classes.filter($"n" > 1L)
        .select($"canon".as("c1"), $"canon".as("c2"),
          lit(0L).as("hamming"),
          expr("(n * (n - 1)) DIV 2").as("pair_mass"))
      cross.unionByName(self).orderBy($"c1", $"c2")
    },
    Some(audioHashSql(audioCatalog + """
        UNION ALL
        SELECT -doc_id - 1 AS id,
               CAST(1 + doc_id % 2 AS BIGINT) AS ch,
               CAST(64 + octet_length(encode(text)) % 32 AS BIGINT)
                 AS frames,
               13 * doc_id AS seed
        FROM documents WHERE doc_id % 10 = 0""") + """
      , hash AS (
        SELECT id,
               MAX(CASE WHEN bk = 0 THEN bv END) AS b0,
               MAX(CASE WHEN bk = 1 THEN bv END) AS b1,
               MAX(CASE WHEN bk = 2 THEN bv END) AS b2,
               MAX(CASE WHEN bk = 3 THEN bv END) AS b3
        FROM bandv GROUP BY id),
      classes AS (
        SELECT b0, b1, b2, b3, MIN(id) AS canon,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM hash GROUP BY b0, b1, b2, b3),
      crossed AS (
        SELECT a.canon AS c1, b.canon AS c2,
               CAST(bit_count(xor(a.b0, b.b0))
                  + bit_count(xor(a.b1, b.b1))
                  + bit_count(xor(a.b2, b.b2))
                  + bit_count(xor(a.b3, b.b3)) AS BIGINT) AS hamming,
               CAST(a.n * b.n AS BIGINT) AS pair_mass
        FROM classes a JOIN classes b ON a.canon < b.canon),
      selfrows AS (
        SELECT canon AS c1, canon AS c2,
               CAST(0 AS BIGINT) AS hamming,
               CAST((n * (n - 1)) // 2 AS BIGINT) AS pair_mass
        FROM classes WHERE n > 1)
      SELECT c1, c2, hamming, pair_mass FROM crossed WHERE hamming <= 3
      UNION ALL
      SELECT c1, c2, hamming, pair_mass FROM selfrows
      ORDER BY c1, c2"""))

  /** Planted-recall gate for the IMAGE perceptual hash (VERDICT-r11
    * item 7 — the invariance claims were argued algebraically but
    * never exercised by a plant): every 10th image gets a genuine
    * brightness edit through the real codec path
    * ([[Multimodal.brightnessShift]], +16 per byte clamped at 255 —
    * clipping included, so invariance is NOT exact by construction),
    * both versions hash through [[Multimodal.perceptualHash]], and
    * the per-image Hamming distance between original and edited
    * fingerprints must land within the banded join's radius.
    * Detection at Hamming ≤ 3 IS banded recovery — 4 bands cannot all
    * differ across ≤ 3 bit flips (the pigeonhole theorem the dedup
    * queries rest on) — so the direct pair join gates exactly what
    * the mm_dedup family would recover, without materializing a
    * corpus-quadratic pair set at sweep scale. The oracle rebuilds
    * BOTH hash variants from the raster algebra (sawtooth bytes,
    * LEAST(byte+16, 255) for the edit) and must agree on n_planted /
    * n_recovered / max_hamming / recall_ok exactly — the measured
    * residual of clipping, pinned bit-for-bit. */
  val mm_phash_shift_recall = GQuery(
    "mm_phash_shift_recall",
    (s, d) => {
      import s.implicits._
      val media = Multimodal.toPpm(T.documents(s, d), "doc_id", "text")
        .filter($"media_id" % 10 === 0L)
      val orig = Multimodal.perceptualHash(media)
        .select($"media_id", $"b0".as("a0"), $"b1".as("a1"),
          $"b2".as("a2"), $"b3".as("a3"))
      val shifted = Multimodal.perceptualHash(
          Multimodal.brightnessShift(media, 16))
        .select($"media_id", $"b0".as("x0"), $"b1".as("x1"),
          $"b2".as("x2"), $"b3".as("x3"))
      orig.join(shifted, "media_id")
        .select((bit_count($"a0".bitwiseXOR($"x0")) +
          bit_count($"a1".bitwiseXOR($"x1")) +
          bit_count($"a2".bitwiseXOR($"x2")) +
          bit_count($"a3".bitwiseXOR($"x3"))).cast("long").as("hamming"))
        .agg(count(lit(1)).as("n_planted"),
          sum(when($"hamming" <= 3L, 1L).otherwise(0L))
            .as("n_recovered"),
          max($"hamming").as("max_hamming"))
        .select($"n_planted", $"n_recovered", $"max_hamming",
          ($"n_recovered" * 10 >= $"n_planted" * 9).as("recall_ok"))
    },
    Some("""
      WITH c AS (
        SELECT doc_id AS id,
               CAST(8 + doc_id % 8 AS BIGINT) AS w,
               CAST(8 + octet_length(encode(text)) % 5 AS BIGINT) AS h,
               13 * doc_id AS seed
        FROM documents WHERE doc_id % 10 = 0),
      bidx AS (
        SELECT id, (j.range // 8) * 8 + (j.range % 8) AS idx,
               7 * (3 * (((j.range // 8) * h // 8) * w
                         + ((j.range % 8) * w // 8))) + seed AS b
        FROM c, range(64) j),
      g0 AS (SELECT id, idx,
                    (b % 256) + ((b + 7) % 256) + ((b + 14) % 256) AS g
             FROM bidx),
      g1 AS (SELECT id, idx,
                    LEAST((b % 256) + 16, 255)
                    + LEAST(((b + 7) % 256) + 16, 255)
                    + LEAST(((b + 14) % 256) + 16, 255) AS g
             FROM bidx),
      t0 AS (SELECT id, SUM(g) AS t FROM g0 GROUP BY id),
      t1 AS (SELECT id, SUM(g) AS t FROM g1 GROUP BY id),
      b0 AS (SELECT g0.id, g0.idx,
                    CASE WHEN g0.g * 64 >= t0.t THEN 1 ELSE 0 END AS bit
             FROM g0 JOIN t0 ON g0.id = t0.id),
      b1 AS (SELECT g1.id, g1.idx,
                    CASE WHEN g1.g * 64 >= t1.t THEN 1 ELSE 0 END AS bit
             FROM g1 JOIN t1 ON g1.id = t1.id),
      ham AS (
        SELECT b0.id,
               CAST(SUM(CASE WHEN b0.bit <> b1.bit THEN 1 ELSE 0 END)
                 AS BIGINT) AS hamming
        FROM b0 JOIN b1 ON b0.id = b1.id AND b0.idx = b1.idx
        GROUP BY b0.id)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_planted,
             CAST(SUM(CASE WHEN hamming <= 3 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_recovered,
             CAST(MAX(hamming) AS BIGINT) AS max_hamming,
             SUM(CASE WHEN hamming <= 3 THEN 1 ELSE 0 END) * 10
               >= COUNT(*) * 9 AS recall_ok
      FROM ham"""))

  /** Planted-recall gate for the AUDIO energy-profile hash — the
    * audio leg of the r12 invariance plants: every 10th chirp clip
    * gets a genuine −6 dB gain edit through the real WAVE path
    * ([[Multimodal.audioGain]] 1/2 — integer quantization, so the
    * gain algebra holds only up to truncation), both versions hash
    * through [[Multimodal.audioHash]], Hamming ≤ 3 must hold for
    * ≥ 90% of plants (detection ⇔ banded recovery by the same
    * pigeonhole theorem). The oracle rebuilds both hashes from the
    * chirp PCM algebra with av DIV 2 as the edited amplitude —
    * exactly the truncation the codec path performs (|v DIV 2| =
    * |v| DIV 2, sign-symmetric) — and pins the measured residual. */
  val mm_audio_gain_recall = GQuery(
    "mm_audio_gain_recall",
    (s, d) => {
      import s.implicits._
      val media =
        Multimodal.toWavChirp(T.documents(s, d), "doc_id", "text")
          .filter($"media_id" % 10 === 0L)
      val orig = Multimodal.audioHash(media)
        .select($"media_id", $"b0".as("a0"), $"b1".as("a1"),
          $"b2".as("a2"), $"b3".as("a3"))
      val gained = Multimodal.audioHash(Multimodal.audioGain(media, 1, 2))
        .select($"media_id", $"b0".as("x0"), $"b1".as("x1"),
          $"b2".as("x2"), $"b3".as("x3"))
      orig.join(gained, "media_id")
        .select((bit_count($"a0".bitwiseXOR($"x0")) +
          bit_count($"a1".bitwiseXOR($"x1")) +
          bit_count($"a2".bitwiseXOR($"x2")) +
          bit_count($"a3".bitwiseXOR($"x3"))).cast("long").as("hamming"))
        .agg(count(lit(1)).as("n_planted"),
          sum(when($"hamming" <= 3L, 1L).otherwise(0L))
            .as("n_recovered"),
          max($"hamming").as("max_hamming"))
        .select($"n_planted", $"n_recovered", $"max_hamming",
          ($"n_recovered" * 10 >= $"n_planted" * 9).as("recall_ok"))
    },
    Some("""
      WITH c AS (
        SELECT doc_id AS id,
               CAST(1 + doc_id % 2 AS BIGINT) AS ch,
               CAST(64 + octet_length(encode(text)) % 32 AS BIGINT)
                 AS frames,
               13 * doc_id AS seed
        FROM documents WHERE doc_id % 10 = 0),
      fr AS (
        SELECT id, frames, (f.range * 64) // frames AS k,
               ABS(((31 * (f.range * ch) * (f.range * ch) + seed)
                     % 65536) - 32768) AS av
        FROM c, range(95) f WHERE f.range < frames),
      w0 AS (SELECT id, frames, k, CAST(SUM(av) AS BIGINT) AS e,
                    CAST(COUNT(*) AS BIGINT) AS cnt
             FROM fr GROUP BY id, frames, k),
      w1 AS (SELECT id, frames, k, CAST(SUM(av // 2) AS BIGINT) AS e,
                    CAST(COUNT(*) AS BIGINT) AS cnt
             FROM fr GROUP BY id, frames, k),
      t0 AS (SELECT id, CAST(SUM(e) AS BIGINT) AS t FROM w0 GROUP BY id),
      t1 AS (SELECT id, CAST(SUM(e) AS BIGINT) AS t FROM w1 GROUP BY id),
      b0 AS (SELECT w0.id, w0.k,
                    CASE WHEN w0.e * w0.frames >= t0.t * w0.cnt
                         THEN 1 ELSE 0 END AS bit
             FROM w0 JOIN t0 ON w0.id = t0.id),
      b1 AS (SELECT w1.id, w1.k,
                    CASE WHEN w1.e * w1.frames >= t1.t * w1.cnt
                         THEN 1 ELSE 0 END AS bit
             FROM w1 JOIN t1 ON w1.id = t1.id),
      ham AS (
        SELECT b0.id,
               CAST(SUM(CASE WHEN b0.bit <> b1.bit THEN 1 ELSE 0 END)
                 AS BIGINT) AS hamming
        FROM b0 JOIN b1 ON b0.id = b1.id AND b0.k = b1.k
        GROUP BY b0.id)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_planted,
             CAST(SUM(CASE WHEN hamming <= 3 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_recovered,
             CAST(MAX(hamming) AS BIGINT) AS max_hamming,
             SUM(CASE WHEN hamming <= 3 THEN 1 ELSE 0 END) * 10
               >= COUNT(*) * 9 AS recall_ok
      FROM ham"""))

  /** DuckDB spelling of the per-frame video hash over a parameterized
    * video catalog CTE `c(id, shots, pershot, seed)` — the y4m luma
    * synthesis rebuilt relationally (the audioHashSql discipline on
    * the video axis): pixel j of a frame in shot s = (7·j·(s+1) +
    * seed + 97·s) mod 256 with seed = 13·doc_id, frame f's shot =
    * f DIV pershot, per-frame bit = 64·g ≥ Σg (the plane IS the 8×8
    * grid at the fixture geometry), 16-bit band packs. range(24)
    * covers the max frame count ((2+2)·(4+2)). */
  /** `p` prefixes every CTE name (see [[phashSql]]). */
  private def videoHashSql(catalogCte: String, p: String = ""): String = s"""
      WITH ${p}c AS ($catalogCte),
      ${p}fr AS (
        SELECT id, seed, shots * pershot AS nf, f.range AS f,
               f.range // pershot AS s
        FROM ${p}c, range(24) f WHERE f.range < shots * pershot),
      ${p}px AS (
        SELECT id, nf, f, j.range AS j,
               (7 * j.range * (s + 1) + seed + 97 * s) % 256 AS g
        FROM ${p}fr, range(64) j),
      ${p}tot AS (SELECT id, f, CAST(SUM(g) AS BIGINT) AS t
              FROM ${p}px GROUP BY id, f),
      ${p}bits AS (
        SELECT px.id, px.nf, px.f, px.j,
               CASE WHEN 64 * px.g >= tot.t THEN 1 ELSE 0 END AS bit
        FROM ${p}px px JOIN ${p}tot tot
          ON px.id = tot.id AND px.f = tot.f),
      ${p}bandv AS (
        SELECT id, nf, f, j // 16 AS bk,
               CAST(SUM((CAST(1 AS BIGINT) << (j % 16)) * bit)
                 AS BIGINT) AS bv
        FROM ${p}bits GROUP BY id, nf, f, j // 16),
      ${p}fh AS (
        SELECT id, nf, f,
               MAX(CASE WHEN bk = 0 THEN bv END) AS b0,
               MAX(CASE WHEN bk = 1 THEN bv END) AS b1,
               MAX(CASE WHEN bk = 2 THEN bv END) AS b2,
               MAX(CASE WHEN bk = 3 THEN bv END) AS b3
        FROM ${p}bandv GROUP BY id, nf, f),
      ${p}ones AS (
        SELECT id, f, CAST(SUM(bit) AS BIGINT) AS n_ones
        FROM ${p}bits GROUP BY id, f)"""

  private val videoCatalog = """
        SELECT doc_id AS id,
               2 + doc_id % 3 AS shots,
               4 + octet_length(encode(text)) % 3 AS pershot,
               13 * doc_id AS seed
        FROM documents"""

  /** Typed video metadata + whole-stream luma checksum through the
    * REAL YUV4MPEG2 decode path ([[Multimodal.extractVideoFeatures]]):
    * geometry and frame rate from a genuine y4m header parse, frame
    * count from the FRAME-delimited plane walk, Σluma over every
    * plane proving the full stream was read. The oracle rebuilds the
    * container arithmetic from the synthesis parameters — 36-byte
    * header + 70 bytes per frame (6-byte FRAME marker + 64-byte
    * plane), duration = frames·40 ms at 25:1 — and the luma sum from
    * the pixel algebra. Scan-bound: one decode per video, map-only
    * until the final sort. */
  val mm_video_meta = GQuery(
    "mm_video_meta",
    (s, d) => {
      import s.implicits._
      Multimodal.extractVideoFeatures(
          Multimodal.toY4m(T.documents(s, d), "doc_id", "text"))
        .select($"media_id", $"n_bytes", $"width", $"height",
          $"fps_num", $"fps_den", $"n_frames", $"duration_ms",
          $"luma_sum")
        .orderBy($"media_id")
    },
    Some(s"""
      WITH c AS ($videoCatalog),
      fr AS (
        SELECT id, seed, shots * pershot AS nf, f.range AS f,
               f.range // pershot AS s
        FROM c, range(24) f WHERE f.range < shots * pershot),
      px AS (
        SELECT id, nf, f,
               (7 * j.range * (s + 1) + seed + 97 * s) % 256 AS g
        FROM fr, range(64) j)
      SELECT id AS media_id,
             CAST(36 + MIN(nf) * 70 AS INT) AS n_bytes,
             8 AS width, 8 AS height, 25 AS fps_num, 1 AS fps_den,
             CAST(MIN(nf) AS INT) AS n_frames,
             CAST(MIN(nf) * 40 AS BIGINT) AS duration_ms,
             CAST(SUM(g) AS BIGINT) AS luma_sum
      FROM px GROUP BY id ORDER BY media_id"""))

  /** Per-frame 64-bit perceptual hash through the real y4m decode
    * ([[Multimodal.videoFrameHash]]) — the mm_phash discipline on the
    * time axis: real codec on the Spark side, pure-SQL luma rebuild
    * on the oracle side, one fingerprint per FRAME that must agree
    * bit-for-bit. One decode emits all of a video's frame rows
    * (scan-bound, no shuffle before the per-frame row). */
  val mm_video_frame_hash = GQuery(
    "mm_video_frame_hash",
    (s, d) => {
      import s.implicits._
      Multimodal.videoFrameHash(
          Multimodal.toY4m(T.documents(s, d), "doc_id", "text"))
        .select($"media_id", $"frame_idx",
          ($"b1" * 65536L + $"b0").as("hash_lo"),
          ($"b3" * 65536L + $"b2").as("hash_hi"), $"n_ones")
        .orderBy($"media_id", $"frame_idx")
    },
    Some(videoHashSql(videoCatalog) + """
      SELECT fh.id AS media_id, CAST(fh.f AS INT) AS frame_idx,
             CAST(fh.b1 * 65536 + fh.b0 AS BIGINT) AS hash_lo,
             CAST(fh.b3 * 65536 + fh.b2 AS BIGINT) AS hash_hi,
             ones.n_ones
      FROM fh JOIN ones ON fh.id = ones.id AND fh.f = ones.f
      ORDER BY media_id, frame_idx"""))

  /** Scene-cut (shot-boundary) detection over the frame-hash stream:
    * a cut is a frame whose perceptual hash sits ≥ 8 Hamming bits
    * from its predecessor — the classic keyframe-extraction primitive
    * (within a shot the fixture's frames are identical, distance 0;
    * across a hard cut both the gradient slope and brightness offset
    * change). Per video: frame count, detected cut count, shot count,
    * first cut position. The lag runs per-video (partitioned window,
    * key-local state); the oracle re-derives every hash from the luma
    * algebra and applies the identical threshold — detection is
    * gated end to end, not against trusted generator metadata. */
  val mm_video_scenecut = GQuery(
    "mm_video_scenecut",
    (s, d) => {
      import s.implicits._
      val fh = Multimodal.videoFrameHash(
        Multimodal.toY4m(T.documents(s, d), "doc_id", "text"))
      val w = Window.partitionBy($"media_id").orderBy($"frame_idx")
      fh.withColumn("hamming",
          bit_count($"b0".bitwiseXOR(lag($"b0", 1).over(w))) +
            bit_count($"b1".bitwiseXOR(lag($"b1", 1).over(w))) +
            bit_count($"b2".bitwiseXOR(lag($"b2", 1).over(w))) +
            bit_count($"b3".bitwiseXOR(lag($"b3", 1).over(w))))
        .withColumn("cut", $"hamming" >= 8)
        .groupBy($"media_id")
        .agg(count(lit(1)).as("n_frames"),
          sum(when($"cut", 1L).otherwise(0L)).as("n_cuts"),
          min(when($"cut", $"frame_idx")).as("first_cut"))
        .select($"media_id", $"n_frames", $"n_cuts",
          ($"n_cuts" + 1L).as("n_shots"), $"first_cut")
        .orderBy($"media_id")
    },
    Some(videoHashSql(videoCatalog) + """
      , lagd AS (
        SELECT id, f,
               bit_count(xor(b0, LAG(b0) OVER w)) +
               bit_count(xor(b1, LAG(b1) OVER w)) +
               bit_count(xor(b2, LAG(b2) OVER w)) +
               bit_count(xor(b3, LAG(b3) OVER w)) AS hamming
        FROM fh WINDOW w AS (PARTITION BY id ORDER BY f))
      SELECT id AS media_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
             CAST(SUM(CASE WHEN hamming >= 8 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_cuts,
             CAST(SUM(CASE WHEN hamming >= 8 THEN 1 ELSE 0 END) + 1
               AS BIGINT) AS n_shots,
             CAST(MIN(CASE WHEN hamming >= 8 THEN f END) AS INT)
               AS first_cut
      FROM lagd GROUP BY id ORDER BY media_id"""))

  /** Video near-dup classes — the [[mm_dedup_audio_canonical]]
    * production shape on the video axis, with a sequence-exact
    * canonicalization tier added: exact classes collapse on the FULL
    * ordered frame-hash sequence (rendered `f:b0:b1:b2:b3` rows
    * joined by commas — injective, so class membership ⇒ identical
    * perceptual footage; every 10th video plants a byte-identical
    * twin under −id−1, the re-upload case), then the pigeonhole-
    * lossless Hamming ≤ 3 banded join runs over each class's
    * KEYFRAME hash (frame nf DIV 2 — the thumbnail-dedup primitive:
    * re-encoded or lightly edited uploads keep their middle keyframe
    * perceptually close). Self/cross pair_mass rows carry the pair
    * information linearly; the oracle brute-forces all class pairs —
    * two algorithms, one answer. */
  val mm_dedup_video_canonical = GQuery(
    "mm_dedup_video_canonical",
    (s, d) => {
      import s.implicits._
      val media = Multimodal.toY4m(T.documents(s, d), "doc_id", "text")
      val plants = media.filter($"media_id" % 10 === 0L)
        .withColumn("media_id", -$"media_id" - 1L)
      val fh = Multimodal.videoFrameHash(media.unionByName(plants))
      val perVid = fh.groupBy($"media_id").agg(
        count(lit(1)).as("nf"),
        concat_ws(",", transform(
          array_sort(collect_list(struct($"frame_idx",
            $"b0", $"b1", $"b2", $"b3"))),
          x => concat_ws(":",
            x.getField("frame_idx").cast("string"),
            x.getField("b0").cast("string"),
            x.getField("b1").cast("string"),
            x.getField("b2").cast("string"),
            x.getField("b3").cast("string")))).as("sig"))
      val keyf = fh.join(perVid, Seq("media_id"))
        .filter($"frame_idx" === ($"nf" / 2).cast("int"))
        .select($"media_id", $"sig", $"b0", $"b1", $"b2", $"b3")
      val classes = keyf.groupBy($"sig")
        .agg(min($"media_id").as("canon"), count(lit(1)).as("n"),
          min($"b0").as("b0"), min($"b1").as("b1"),
          min($"b2").as("b2"), min($"b3").as("b3"))
        .localCheckpoint()
      val bands = classes.select($"canon",
        posexplode(array($"b0", $"b1", $"b2", $"b3")).as(Seq("bk", "bv")))
      val cand = bands.alias("a").join(bands.alias("b"),
          col("a.bk") === col("b.bk") && col("a.bv") === col("b.bv") &&
            col("a.canon") < col("b.canon"))
        .select(col("a.canon").as("c1"), col("b.canon").as("c2"))
        .distinct()
      val hx = classes.select($"canon", $"b0", $"b1", $"b2", $"b3", $"n")
      val cross = cand
        .join(hx.toDF("c1", "a0", "a1", "a2", "a3", "n1"), "c1")
        .join(hx.toDF("c2", "x0", "x1", "x2", "x3", "n2"), "c2")
        .select($"c1", $"c2",
          (bit_count($"a0".bitwiseXOR($"x0")) +
            bit_count($"a1".bitwiseXOR($"x1")) +
            bit_count($"a2".bitwiseXOR($"x2")) +
            bit_count($"a3".bitwiseXOR($"x3"))).cast("long")
            .as("hamming"),
          ($"n1" * $"n2").as("pair_mass"))
        .filter($"hamming" <= 3L)
      val self = classes.filter($"n" > 1L)
        .select($"canon".as("c1"), $"canon".as("c2"),
          lit(0L).as("hamming"),
          expr("(n * (n - 1)) DIV 2").as("pair_mass"))
      cross.unionByName(self).orderBy($"c1", $"c2")
    },
    Some(videoHashSql(videoCatalog + """
        UNION ALL
        SELECT -doc_id - 1 AS id,
               2 + doc_id % 3 AS shots,
               4 + octet_length(encode(text)) % 3 AS pershot,
               13 * doc_id AS seed
        FROM documents WHERE doc_id % 10 = 0""") + """
      , sig AS (
        SELECT id, MIN(nf) AS nf,
               string_agg(CAST(f AS VARCHAR) || ':' ||
                 CAST(b0 AS VARCHAR) || ':' || CAST(b1 AS VARCHAR) ||
                 ':' || CAST(b2 AS VARCHAR) || ':' ||
                 CAST(b3 AS VARCHAR), ',' ORDER BY f) AS sig
        FROM fh GROUP BY id),
      keyf AS (
        SELECT fh.id, s.sig, fh.b0, fh.b1, fh.b2, fh.b3
        FROM fh JOIN sig s ON fh.id = s.id AND fh.f = s.nf // 2),
      classes AS (
        SELECT sig, MIN(id) AS canon, CAST(COUNT(*) AS BIGINT) AS n,
               MIN(b0) AS b0, MIN(b1) AS b1,
               MIN(b2) AS b2, MIN(b3) AS b3
        FROM keyf GROUP BY sig),
      crossed AS (
        SELECT a.canon AS c1, b.canon AS c2,
               CAST(bit_count(xor(a.b0, b.b0))
                  + bit_count(xor(a.b1, b.b1))
                  + bit_count(xor(a.b2, b.b2))
                  + bit_count(xor(a.b3, b.b3)) AS BIGINT) AS hamming,
               CAST(a.n * b.n AS BIGINT) AS pair_mass
        FROM classes a JOIN classes b ON a.canon < b.canon),
      selfrows AS (
        SELECT canon AS c1, canon AS c2,
               CAST(0 AS BIGINT) AS hamming,
               CAST((n * (n - 1)) // 2 AS BIGINT) AS pair_mass
        FROM classes WHERE n > 1)
      SELECT c1, c2, hamming, pair_mass FROM crossed WHERE hamming <= 3
      UNION ALL
      SELECT c1, c2, hamming, pair_mass FROM selfrows
      ORDER BY c1, c2"""))

  /** Planted-recall gate for the VIDEO perceptual hash — the
    * mm_phash_shift_recall discipline on the time axis, so the video
    * family's invariance claim is measured the round it ships rather
    * than owed: every 10th video gets a genuine +16 brightness edit
    * through the real y4m path ([[Multimodal.lumaShift]] — decode,
    * clamp-add at 255, re-encode; clipping included, so invariance is
    * honestly approximate), both versions hash per-frame through
    * [[Multimodal.videoFrameHash]], and the PER-VIDEO MAX frame
    * Hamming must land within the banded radius — stronger than a
    * keyframe-only check, since a single clipped frame anywhere in
    * the stream breaks it. Detection at Hamming ≤ 3 IS banded
    * recovery by the 4-band pigeonhole theorem, so this gates what
    * mm_dedup_video_canonical would recover for an exposure-edited
    * re-upload. The oracle rebuilds BOTH hash variants from the luma
    * algebra (LEAST(g+16, 255)) and pins n_planted / n_recovered /
    * max_hamming exactly — the clipping residual, bit-for-bit. */
  val mm_video_shift_recall = GQuery(
    "mm_video_shift_recall",
    (s, d) => {
      import s.implicits._
      val media = Multimodal.toY4m(T.documents(s, d), "doc_id", "text")
        .filter($"media_id" % 10 === 0L)
      val orig = Multimodal.videoFrameHash(media)
        .select($"media_id", $"frame_idx", $"b0".as("a0"),
          $"b1".as("a1"), $"b2".as("a2"), $"b3".as("a3"))
      val edited =
        Multimodal.videoFrameHash(Multimodal.lumaShift(media, 16))
          .select($"media_id", $"frame_idx", $"b0".as("x0"),
            $"b1".as("x1"), $"b2".as("x2"), $"b3".as("x3"))
      orig.join(edited, Seq("media_id", "frame_idx"))
        .select($"media_id",
          (bit_count($"a0".bitwiseXOR($"x0")) +
            bit_count($"a1".bitwiseXOR($"x1")) +
            bit_count($"a2".bitwiseXOR($"x2")) +
            bit_count($"a3".bitwiseXOR($"x3"))).cast("long").as("hamming"))
        .groupBy($"media_id").agg(max($"hamming").as("vham"))
        .agg(count(lit(1)).as("n_planted"),
          sum(when($"vham" <= 3L, 1L).otherwise(0L)).as("n_recovered"),
          max($"vham").as("max_hamming"))
        .select($"n_planted", $"n_recovered", $"max_hamming",
          ($"n_recovered" * 10 >= $"n_planted" * 9).as("recall_ok"))
    },
    Some("""
      WITH c AS (
        SELECT doc_id AS id,
               2 + doc_id % 3 AS shots,
               4 + octet_length(encode(text)) % 3 AS pershot,
               13 * doc_id AS seed
        FROM documents WHERE doc_id % 10 = 0),
      fr AS (
        SELECT id, seed, shots * pershot AS nf, f.range AS f,
               f.range // pershot AS s
        FROM c, range(24) f WHERE f.range < shots * pershot),
      px AS (
        SELECT id, f, j.range AS j,
               (7 * j.range * (s + 1) + seed + 97 * s) % 256 AS g
        FROM fr, range(64) j),
      px2 AS (SELECT id, f, j, g, LEAST(g + 16, 255) AS g2 FROM px),
      t0 AS (SELECT id, f, CAST(SUM(g) AS BIGINT) AS t
             FROM px2 GROUP BY id, f),
      t1 AS (SELECT id, f, CAST(SUM(g2) AS BIGINT) AS t
             FROM px2 GROUP BY id, f),
      b0 AS (SELECT px2.id, px2.f, px2.j,
                    CASE WHEN 64 * px2.g >= t0.t THEN 1 ELSE 0 END AS bit
             FROM px2 JOIN t0 ON px2.id = t0.id AND px2.f = t0.f),
      b1 AS (SELECT px2.id, px2.f, px2.j,
                    CASE WHEN 64 * px2.g2 >= t1.t THEN 1 ELSE 0 END AS bit
             FROM px2 JOIN t1 ON px2.id = t1.id AND px2.f = t1.f),
      fham AS (
        SELECT b0.id, b0.f,
               CAST(SUM(CASE WHEN b0.bit <> b1.bit THEN 1 ELSE 0 END)
                 AS BIGINT) AS hamming
        FROM b0 JOIN b1 ON b0.id = b1.id AND b0.f = b1.f AND b0.j = b1.j
        GROUP BY b0.id, b0.f),
      vham AS (SELECT id, MAX(hamming) AS vham FROM fham GROUP BY id)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_planted,
             CAST(SUM(CASE WHEN vham <= 3 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_recovered,
             CAST(MAX(vham) AS BIGINT) AS max_hamming,
             SUM(CASE WHEN vham <= 3 THEN 1 ELSE 0 END) * 10
               >= COUNT(*) * 9 AS recall_ok
      FROM vham"""))

  /** The MULTIMODAL corpus release in ONE oracle-gated plan
    * (VERDICT-r13 "what's missing" #5): [[Pipeline.corpus_release_e2e]]
    * composes the text pipeline, but the modality dedup verdicts
    * (mm_dedup_{phash,audio,video}_canonical) never drove a composed
    * keep/drop decision — this gate is that release. The corpus is a
    * content-addressable media store (one synthetic payload per
    * generator id, hashed ONCE per modality through the REAL decode
    * paths — PPM→aHash, WAVE→energy hash, y4m→keyframe frame-hash);
    * docs reference payloads through per-modality mappings, with
    * planted re-uploads (image: doc_id%10=6 references doc_id−1's
    * payload; audio: %7=4 → −2; video: %13=9 → −3 — disjoint partner
    * rules so the modality drop sets genuinely differ, and no partner
    * is itself remapped in the same modality). Keep/drop per
    * modality: exact-fingerprint classes collapse (canonical = min
    * doc), non-canonical members DROP; the image tier additionally
    * drops every class whose canonical pairs at Hamming ≤ 3 with a
    * smaller-canon class (the mm_dedup_phash_canonical near-dup tier
    * driving a decision — banded pigeonhole join on the Spark side,
    * brute-force class pairs in the oracle: two algorithms, one drop
    * set). The text tier is [[Pipeline.corpus_release_e2e]]'s steep
    * near-dup rule verbatim (verified Jaccard ≥ 0.8, larger member
    * drops). Output: one row per doc with the four drop verdicts and
    * the final kept flag — any wrongly kept/dropped doc in ANY
    * modality breaks the hash.
    *
    * Scale shape: hashing is scan-bound (one decode per payload, no
    * shuffle before the per-payload row); classes are map-side
    * combinable aggregates; the banded join runs over the CLASS
    * table (bounded by content diversity, not corpus size); the drop
    * sets broadcast back onto the doc spine. */
  val mm_release_e2e = GQuery(
    "mm_release_e2e",
    (s, d) => {
      import s.implicits._
      import graft.operators.Dedup
      val docs = T.documents(s, d).select($"doc_id", $"text")
      // the media store: one payload per generator id, hashed once
      val imgH = Multimodal.perceptualHash(
          Multimodal.toPpm(docs, "doc_id", "text"))
        .select($"media_id", $"b0", $"b1", $"b2", $"b3")
      val audH = Multimodal.audioHash(
          Multimodal.toWavChirp(docs, "doc_id", "text"))
        .select($"media_id", $"b0", $"b1", $"b2", $"b3")
      // r14 note: per-modality lineage cuts (fh + each mapped table)
      // were tried to collapse the 2-4 decode re-references per
      // modality — measured SLOWER (3.3 → 4.8 s warm at local[32]):
      // the duplicated decodes live in independent broadcast subtrees
      // that build CONCURRENTLY on separate driver threads, while the
      // eager checkpoints serialize them. Left lazy on purpose.
      val fh = Multimodal.videoFrameHash(
        Multimodal.toY4m(docs, "doc_id", "text"))
      val nf = fh.groupBy($"media_id").agg(count(lit(1)).as("nf"))
      val vidH = fh.join(nf, Seq("media_id"))
        .filter($"frame_idx" === ($"nf" / 2).cast("int"))
        .select($"media_id", $"b0", $"b1", $"b2", $"b3")
      // docs reference payloads: planted re-uploads borrow a partner's
      def mapped(h: org.apache.spark.sql.DataFrame,
          cond: org.apache.spark.sql.Column,
          partner: org.apache.spark.sql.Column) =
        docs.select($"doc_id",
            when(cond, partner).otherwise($"doc_id").as("media_id"))
          .join(h, Seq("media_id")).drop("media_id")
      val iDoc = mapped(imgH, $"doc_id" % 10 === 6, $"doc_id" - 1)
      val aDoc = mapped(audH, $"doc_id" % 7 === 4, $"doc_id" - 2)
      val vDoc = mapped(vidH, $"doc_id" % 13 === 9, $"doc_id" - 3)
      def classesOf(dd: org.apache.spark.sql.DataFrame) =
        dd.groupBy($"b0", $"b1", $"b2", $"b3")
          .agg(min($"doc_id").as("canon"))
      // image near-dup tier: banded Hamming ≤ 3 over the class table;
      // a class pairing with a smaller-canon class drops WHOLE
      val iCls = classesOf(iDoc).localCheckpoint()
      val bands = iCls.select($"canon",
        posexplode(array($"b0", $"b1", $"b2", $"b3")).as(Seq("bk", "bv")))
      val hx = iCls.select($"canon", $"b0", $"b1", $"b2", $"b3")
      val victims = bands.alias("a").join(bands.alias("b"),
          col("a.bk") === col("b.bk") && col("a.bv") === col("b.bv") &&
            col("a.canon") < col("b.canon"))
        .select(col("a.canon").as("c1"), col("b.canon").as("c2"))
        .distinct()
        .join(hx.toDF("c1", "a0", "a1", "a2", "a3"), "c1")
        .join(hx.toDF("c2", "x0", "x1", "x2", "x3"), "c2")
        .filter((bit_count($"a0".bitwiseXOR($"x0")) +
          bit_count($"a1".bitwiseXOR($"x1")) +
          bit_count($"a2".bitwiseXOR($"x2")) +
          bit_count($"a3".bitwiseXOR($"x3"))).cast("long") <= 3L)
        .select($"c2".as("canon")).distinct()
        .withColumn("victim", lit(true))
      val iDrop = iDoc.join(iCls, Seq("b0", "b1", "b2", "b3"))
        .join(victims, Seq("canon"), "left")
        .filter($"doc_id" > $"canon" ||
          coalesce($"victim", lit(false)))
        .select($"doc_id")
      def exactDrop(dd: org.apache.spark.sql.DataFrame) =
        dd.join(classesOf(dd), Seq("b0", "b1", "b2", "b3"))
          .filter($"doc_id" > $"canon").select($"doc_id")
      val aDrop = exactDrop(aDoc)
      val vDrop = exactDrop(vDoc)
      // text tier: the corpus_release_e2e steep near-dup rule verbatim
      val tDrop = Dedup.verifiedNearDups(docs, "doc_id", "text", 0.8,
          numHashes = 16, bandSize = 4)
        .select($"d2".as("doc_id")).distinct()
      def flag(dd: org.apache.spark.sql.DataFrame, name: String) =
        broadcast(dd.withColumn(name, lit(true)))
      docs.select($"doc_id")
        .join(flag(iDrop, "di"), Seq("doc_id"), "left")
        .join(flag(aDrop, "da"), Seq("doc_id"), "left")
        .join(flag(vDrop, "dv"), Seq("doc_id"), "left")
        .join(flag(tDrop, "dt"), Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"di", lit(false)).as("drop_img"),
          coalesce($"da", lit(false)).as("drop_aud"),
          coalesce($"dv", lit(false)).as("drop_vid"),
          coalesce($"dt", lit(false)).as("drop_txt"),
          (!coalesce($"di", lit(false)) && !coalesce($"da", lit(false)) &&
            !coalesce($"dv", lit(false)) && !coalesce($"dt", lit(false)))
            .as("kept"))
        .orderBy($"doc_id")
    },
    Some {
      val imgCatalog = """
        SELECT doc_id AS id,
               CAST(8 + doc_id % 8 AS BIGINT) AS w,
               CAST(8 + octet_length(encode(text)) % 5 AS BIGINT) AS h,
               13 * doc_id AS seed
        FROM documents"""
      val mins = (0 until 16).map(p =>
        s"MIN(substr(m, ${p * 8 + 1}, 8)) AS h$p").mkString(", ")
      val txtBands = (0 until 4).map { b =>
        val key = (0 until 4).map(j => s"h${b * 4 + j}")
          .mkString(s"'$b:' || ", " || ':' || ", "")
        val sel = s"SELECT doc_id, md5($key) AS bk FROM txt_sig"
        if (b == 0) sel else s"UNION ALL $sel"
      }.mkString(" ")
      phashSql(imgCatalog, "img_") + "," +
        audioHashSql(audioCatalog, "aud_").replaceFirst("WITH ", "") +
        "," +
        videoHashSql(videoCatalog, "vid_").replaceFirst("WITH ", "") +
        s""",
      txt_toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      txt_sh AS (
        SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
        FROM txt_toks, LATERAL (SELECT UNNEST(range(1, len(t) - 1))
          AS i) u),
      txt_hx AS (
        SELECT doc_id, sh,
               md5(sh) || md5(reverse(sh)) || md5(sh || '#')
                 || md5('#' || sh) AS m
        FROM txt_sh),
      txt_sig AS (SELECT doc_id, $mins FROM txt_hx GROUP BY doc_id),
      txt_bands AS ($txtBands),
      txt_cands AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        FROM txt_bands a JOIN txt_bands b
          ON a.bk = b.bk AND a.doc_id < b.doc_id),
      txt_sets AS (
        SELECT doc_id, list_distinct(list(sh)) AS shset
        FROM txt_sh GROUP BY doc_id),
      txt_drop AS (
        SELECT DISTINCT d2 AS doc_id
        FROM txt_cands JOIN txt_sets x ON d1 = x.doc_id
                       JOIN txt_sets y ON d2 = y.doc_id
        WHERE len(x.shset) + len(y.shset)
              - len(list_intersect(x.shset, y.shset)) > 0
          AND CAST(len(list_intersect(x.shset, y.shset)) AS DOUBLE) /
              CAST(len(x.shset) + len(y.shset)
                   - len(list_intersect(x.shset, y.shset)) AS DOUBLE)
              >= 0.8),
      imgh AS (
        SELECT id,
               MAX(CASE WHEN bk = 0 THEN bv END) AS b0,
               MAX(CASE WHEN bk = 1 THEN bv END) AS b1,
               MAX(CASE WHEN bk = 2 THEN bv END) AS b2,
               MAX(CASE WHEN bk = 3 THEN bv END) AS b3
        FROM img_bandv GROUP BY id),
      audh AS (
        SELECT id,
               MAX(CASE WHEN bk = 0 THEN bv END) AS b0,
               MAX(CASE WHEN bk = 1 THEN bv END) AS b1,
               MAX(CASE WHEN bk = 2 THEN bv END) AS b2,
               MAX(CASE WHEN bk = 3 THEN bv END) AS b3
        FROM aud_bandv GROUP BY id),
      vidh AS (
        SELECT id, b0, b1, b2, b3 FROM vid_fh WHERE f = nf // 2),
      imap AS (
        SELECT doc_id, CASE WHEN doc_id % 10 = 6 THEN doc_id - 1
                            ELSE doc_id END AS gid
        FROM documents),
      idoc AS (
        SELECT m.doc_id, h.b0, h.b1, h.b2, h.b3
        FROM imap m JOIN imgh h ON h.id = m.gid),
      iclass AS (
        SELECT b0, b1, b2, b3, MIN(doc_id) AS canon
        FROM idoc GROUP BY b0, b1, b2, b3),
      ivictim AS (
        SELECT DISTINCT b.canon FROM iclass a JOIN iclass b
          ON a.canon < b.canon
        WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
            + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
            <= 3),
      idrop AS (
        SELECT d.doc_id FROM idoc d JOIN iclass c
          ON d.b0 = c.b0 AND d.b1 = c.b1 AND d.b2 = c.b2
             AND d.b3 = c.b3
        WHERE d.doc_id > c.canon
           OR c.canon IN (SELECT canon FROM ivictim)),
      amap AS (
        SELECT doc_id, CASE WHEN doc_id % 7 = 4 THEN doc_id - 2
                            ELSE doc_id END AS gid
        FROM documents),
      adoc AS (
        SELECT m.doc_id, h.b0, h.b1, h.b2, h.b3
        FROM amap m JOIN audh h ON h.id = m.gid),
      aclass AS (
        SELECT b0, b1, b2, b3, MIN(doc_id) AS canon
        FROM adoc GROUP BY b0, b1, b2, b3),
      adrop AS (
        SELECT d.doc_id FROM adoc d JOIN aclass c
          ON d.b0 = c.b0 AND d.b1 = c.b1 AND d.b2 = c.b2
             AND d.b3 = c.b3
        WHERE d.doc_id > c.canon),
      vmap AS (
        SELECT doc_id, CASE WHEN doc_id % 13 = 9 THEN doc_id - 3
                            ELSE doc_id END AS gid
        FROM documents),
      vdoc AS (
        SELECT m.doc_id, h.b0, h.b1, h.b2, h.b3
        FROM vmap m JOIN vidh h ON h.id = m.gid),
      vclass AS (
        SELECT b0, b1, b2, b3, MIN(doc_id) AS canon
        FROM vdoc GROUP BY b0, b1, b2, b3),
      vdrop AS (
        SELECT d.doc_id FROM vdoc d JOIN vclass c
          ON d.b0 = c.b0 AND d.b1 = c.b1 AND d.b2 = c.b2
             AND d.b3 = c.b3
        WHERE d.doc_id > c.canon)
      SELECT d.doc_id,
             d.doc_id IN (SELECT doc_id FROM idrop) AS drop_img,
             d.doc_id IN (SELECT doc_id FROM adrop) AS drop_aud,
             d.doc_id IN (SELECT doc_id FROM vdrop) AS drop_vid,
             d.doc_id IN (SELECT doc_id FROM txt_drop) AS drop_txt,
             NOT (d.doc_id IN (SELECT doc_id FROM idrop)
               OR d.doc_id IN (SELECT doc_id FROM adrop)
               OR d.doc_id IN (SELECT doc_id FROM vdrop)
               OR d.doc_id IN (SELECT doc_id FROM txt_drop)) AS kept
      FROM documents d ORDER BY doc_id"""
    })

  /** HLL approx-distinct with its accuracy contract hash-checked: the
    * oracle pins the exact count, and the boolean asserts the ±2%-rsd
    * sketch landed within 5% of it — so the sketch path is verified
    * rather than merely row-counted. */
  val agg_approx_distinct = GQuery(
    "agg_approx_distinct",
    (s, d) => {
      import s.implicits._
      T.events(s, d)
        .groupBy($"event_type")
        .agg(countDistinct($"user_id").as("exact_users"),
          approx_count_distinct($"user_id", 0.02).as("approx"))
        .select($"event_type", $"exact_users",
          (abs($"approx" - $"exact_users") <= $"exact_users" * lit(0.05))
            .as("approx_ok"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
             TRUE AS approx_ok
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** KMeans(k=5) profile clustering contract (SURVEY §2.8). Raw
    * assignments are model-derived (seed/partitioning-sensitive), so
    * the oracle gates the invariants any correct fit must satisfy:
    * totality (every profiled player assigned exactly one cluster) and
    * Lloyd convergence (fitted WCSS ≤ total sum of squares around the
    * global centroid — the k=1 solution — by variance decomposition).
    * All driver-side collects are bounded single-row aggregates; raw
    * cluster behavior is pinned in MLSpec. */
  val ml_kmeans_profiles = GQuery(
    "ml_kmeans_profiles",
    (s, d) => {
      import s.implicits._
      // profile-shaped features from the events table
      val profiles = T.events(s, d)
        .groupBy($"user_id".as("playerId"))
        .agg(
          sum(when($"event_type" === "error", 1L).otherwise(0L)).as("fouls"),
          sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("goals"),
          sum(when($"event_type" === "signup", 1L).otherwise(0L)).as("own_goals"),
          avg($"value").as("pass_accuracy"),
          sum(when($"event_type" === "click", 1L).otherwise(0L)).as("shots_on_target"),
          count(lit(1)).as("matches_played"))
        .cache()
      try {
        val (assigned, wcss) =
          graft.fpl.MLCapabilities.clusterProfilesWithCost(profiles)
        val tss = profiles.agg(
          (graft.fpl.MLCapabilities.featureCols
            .map(f => var_pop(col(f).cast("double"))).reduce(_ + _) *
            count(lit(1))).as("tss")).first().getDouble(0)
        val st = assigned.agg(
          count(lit(1)).as("n_assigned"),
          countDistinct($"playerId").as("n_players"),
          min($"cluster").as("cmin"), max($"cluster").as("cmax")).first()
        val totalityOk = st.getLong(0) == st.getLong(1) &&
          st.getInt(2) >= 0 && st.getInt(3) < 5
        // relative epsilon: trainingCost and the SQL TSS differ only by
        // float-summation order
        val wcssOk = wcss <= tss * (1 + 1e-9) + 1e-6
        s.range(1).select(lit(st.getLong(1)).as("n_players"),
          lit(totalityOk).as("totality_ok"), lit(wcssOk).as("wcss_ok"))
      } finally profiles.unpersist()
    },
    Some("""
      SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_players,
             TRUE AS totality_ok, TRUE AS wcss_ok
      FROM events"""))

  /** KMeans contract: with the fixed seed, clustering must assign
    * every profiled player to one of exactly k=5 non-degenerate
    * clusters — the oracle predicts the player count from the raw
    * events, so the ML path is gated beyond a bare row count. */
  val ml_kmeans_contract = GQuery(
    "ml_kmeans_contract",
    (s, d) => {
      import s.implicits._
      val profiles = T.events(s, d)
        .groupBy($"user_id".as("playerId"))
        .agg(
          sum(when($"event_type" === "error", 1L).otherwise(0L)).as("fouls"),
          sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("goals"),
          sum(when($"event_type" === "signup", 1L).otherwise(0L)).as("own_goals"),
          avg($"value").as("pass_accuracy"),
          sum(when($"event_type" === "click", 1L).otherwise(0L)).as("shots_on_target"),
          count(lit(1)).as("matches_played"))
      // 1..k non-empty clusters, not exactly k: KMeans may leave a
      // centroid empty on unimodal data, and that is correct behavior.
      // maxIter=2: the contract checks assignment totality, not
      // centroid quality — no reason to pay full Lloyd convergence
      graft.fpl.MLCapabilities.clusterProfiles(profiles, maxIter = 2)
        .agg(countDistinct($"cluster").as("nc"),
          count(lit(1)).as("n_players"))
        .select(($"nc" >= 1 && $"nc" <= 5).as("clusters_ok"),
          $"n_players")
    },
    Some("""
      SELECT TRUE AS clusters_ok,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_players
      FROM events"""))

  /** Quadratic-regression contract (reference docs/Specs.pdf p.8,
    * SURVEY §2.8): fit rating ~ β₀ + β₁·age + β₂·age² via
    * MLCapabilities.ratingVsAge on an exactly quadratic training set
    * (spark.range-derived, deterministic), then score one row per
    * distinct age. The normal-equation solve must recover the
    * generating polynomial, so predictions are gated within 1e-4 of
    * the analytic truth, and the "retired below 0.2" rule must match
    * truth — the nearest truth value to the 0.2 boundary is 0.0225
    * away by construction, so the boolean cannot flap. */
  val ml_quadfit_contract = GQuery(
    "ml_quadfit_contract",
    (s, _) => {
      import s.implicits._
      def truth(age: org.apache.spark.sql.Column) =
        lit(0.9) - lit(0.0025) * (age - 27) * (age - 27)
      val train = s.range(0, 300)
        .select(($"id" % 30 + 16).cast("double").as("age"))
        .withColumn("rating", truth($"age"))
      val scorer = graft.fpl.MLCapabilities.ratingVsAge(train)
      val holdout = s.range(16, 46).select($"id".cast("double").as("age"))
      scorer(holdout)
        .select($"age".cast("int").as("age"), $"retired",
          (abs($"predicted_rating" - truth($"age")) < 1e-4).as("within_tol"))
        .orderBy($"age")
    },
    Some("""
      SELECT CAST(range AS INT) AS age,
             (0.9 - 0.0025*(range-27)*(range-27)) < 0.2 AS retired,
             TRUE AS within_tol
      FROM range(16, 46) ORDER BY age"""))

  /** PCA contract over the embedding corpus — the dimensionality
    * reduction an ANN pipeline runs before IVF/PQ (64 → 8 here).
    * MLlib PCA (covariance eigendecomposition; SURVEY §2.8's third
    * MLlib capability after KMeans and the quadratic fit). Gated
    * PROPERTIES, not floats (the kmeans/quadfit posture):
    *  - `orthonormal_ok`: the 64×8 loading matrix satisfies
    *    PCᵀPC = I₈ within 1e-8 — checked driver-side on the
    *    dim-bounded model matrix (64×8 doubles, never data-sized);
    *  - `explained_ordered_ok`: explainedVariance proportions are
    *    non-negative, non-increasing, and sum ≤ 1;
    *  - `proj_var_ordered_ok`: the DISTRIBUTED check — per-component
    *    variances of the projected corpus (one var_pop aggregate over
    *    all 8 components in a single pass) are non-increasing, i.e.
    *    the fitted directions actually sort the data's variance, not
    *    just the model's own eigenvalues. var(Xv) = vᵀΣv is
    *    shift-invariant, so the check is exact even though MLlib
    *    projects uncentered vectors.
    * The oracle predicts n_vecs relationally and pins the three
    * booleans TRUE. */
  val ml_pca_contract = GQuery(
    "ml_pca_contract",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.ml.feature.PCA
      import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
      val feats = T.embeddings(s, d)
        .select($"vec_id",
          array_to_vector($"embedding".cast("array<double>"))
            .as("features"))
      val model = new PCA().setInputCol("features").setOutputCol("pc")
        .setK(8).fit(feats)
      val pc = model.pc
      val dim = pc.numRows
      val k = pc.numCols
      val colv = (0 until k).map(c => (0 until dim).map(r => pc(r, c)))
      val orthonormal = (for { i <- 0 until k; j <- i until k } yield {
        val dot = (0 until dim).map(t => colv(i)(t) * colv(j)(t)).sum
        math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-8
      }).forall(identity)
      val ev = model.explainedVariance.toArray
      val evOk = ev.forall(_ >= -1e-12) &&
        ev.zip(ev.tail).forall { case (a, b) => a >= b - 1e-12 } &&
        ev.sum <= 1.0 + 1e-9
      val proj = model.transform(feats)
        .select(vector_to_array($"pc").as("p"))
      val varCols = (0 until k).map(i =>
        var_pop(element_at($"p", i + 1)).as(s"v$i"))
      val vr = proj.agg(varCols.head, varCols.tail: _*).first()
      val pvars = (0 until k).map(vr.getDouble)
      val projOk = pvars.zip(pvars.tail).forall {
        case (a, b) => a >= b - 1e-6 * math.max(pvars.head, 1e-300)
      }
      val n = feats.count()
      s.range(1).select(
        lit(n).as("n_vecs"),
        lit(k.toLong).as("k"),
        lit(orthonormal).as("orthonormal_ok"),
        lit(evOk).as("explained_ordered_ok"),
        lit(projOk).as("proj_var_ordered_ok"))
    },
    Some("""
      SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
             CAST(8 AS BIGINT) AS k,
             TRUE AS orthonormal_ok,
             TRUE AS explained_ordered_ok,
             TRUE AS proj_var_ordered_ok
      FROM embeddings"""))

  /** Set operations (INTERSECT/EXCEPT with distinct semantics). */
  val set_ops = GQuery(
    "set_ops",
    (s, d) => {
      import s.implicits._
      val e = T.events(s, d)
      def users(t: String) =
        e.filter($"event_type" === t).select($"user_id")
      users("click").intersect(users("purchase"))
        .except(users("error"))
        .orderBy($"user_id")
    },
    Some("""
      SELECT user_id FROM events WHERE event_type = 'click'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'purchase'
      EXCEPT
      SELECT user_id FROM events WHERE event_type = 'error'
      ORDER BY user_id"""))

  /** Ranking + offset window functions (rank over per-user spend,
    * lead/lag deltas). */
  val w2_rank_lag = GQuery(
    "w2_rank_lag",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc,
        $"o_orderkey")
      T.orders(s, d)
        .withColumn("rk", rank().over(w))
        .withColumn("prev_price", lag($"o_totalprice", 1).over(w))
        .filter($"rk" <= 3)
        .select($"o_custkey", $"rk", $"o_orderkey", $"o_totalprice",
          coalesce(round($"o_totalprice" - $"prev_price", 2), lit(0.0))
            .as("gap_to_prev"))
        .orderBy($"o_custkey", $"rk")
    },
    Some("""
      SELECT o_custkey, CAST(rk AS INT) AS rk, o_orderkey, o_totalprice,
             COALESCE(ROUND(o_totalprice - prev_price, 2), 0.0) AS gap_to_prev
      FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               RANK() OVER w AS rk,
               LAG(o_totalprice, 1) OVER w AS prev_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey))
      WHERE rk <= 3 ORDER BY o_custkey, rk"""))

  /** Full outer join with null-side handling. */
  val j6_outer_join = GQuery(
    "j6_outer_join",
    (s, d) => {
      import s.implicits._
      val perCust = T.orders(s, d)
        .filter($"o_orderpriority" === "1-URGENT")
        .groupBy($"o_custkey").agg(count(lit(1)).as("n_urgent"))
      T.customer(s, d)
        .join(perCust, $"c_custkey" === $"o_custkey", "full_outer")
        .select(
          coalesce($"c_custkey", $"o_custkey").as("custkey"),
          coalesce($"c_mktsegment", lit("UNKNOWN")).as("segment"),
          coalesce($"n_urgent", lit(0L)).as("n_urgent"))
        .orderBy($"custkey")
    },
    Some("""
      SELECT COALESCE(c_custkey, o_custkey) AS custkey,
             COALESCE(c_mktsegment, 'UNKNOWN') AS segment,
             COALESCE(n_urgent, 0) AS n_urgent
      FROM customer
      FULL OUTER JOIN (
        SELECT o_custkey, COUNT(*) AS n_urgent
        FROM orders WHERE o_orderpriority = '1-URGENT'
        GROUP BY o_custkey) o
        ON c_custkey = o_custkey
      ORDER BY custkey"""))

  /** As-of join: each purchase attributed to the user's most recent
    * click (classic attribution). Spark side composes union+window
    * (graft.operators.AsOfJoin); the oracle uses DuckDB's native
    * ASOF JOIN — two entirely different implementations, same rows. */
  val asof_attribution = GQuery(
    "asof_attribution",
    (s, d) => {
      import s.implicits._
      val e = T.events(s, d)
      val clicks = e.filter($"event_type" === "click")
        .groupBy($"user_id", $"ts")
        .agg(max($"event_id").as("click_id"))
      val purchases = e.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id".as("purchase_id"), $"value")
      graft.operators.AsOfJoin.asofBackward(purchases, clicks,
          Seq("user_id"), "ts", "ts", Seq("click_id"))
        .select($"user_id", $"purchase_id", $"click_id", $"value")
        .orderBy($"purchase_id")
    },
    Some("""
      WITH clicks AS (
        SELECT user_id, ts, MAX(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      p AS (
        SELECT user_id, ts, event_id AS purchase_id, value
        FROM events WHERE event_type = 'purchase')
      SELECT p.user_id, p.purchase_id, c.click_id, p.value
      FROM p ASOF JOIN clicks c
        ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY purchase_id"""))

  /** Forward as-of join: each purchase matched to the user's NEXT
    * click at-or-after it (post-purchase engagement — the other
    * direction of pandas merge_asof, completing [[asof_attribution]]'s
    * backward pin). Spark side is the mirrored union+window
    * composition (AsOfJoin.asofForward: left-before-right at equal ts,
    * then last-ignoreNulls over an ORDER BY ts DESC running
    * [unbounded preceding, current row] frame — the O(n)-per-key
    * spelling; the naive "first over [current, ∞)" frame is the
    * O(n²) UnboundedFollowing form QuerySmokeSpec's plan audit
    * rejects — still ONE keyed shuffle, no range product); the
    * oracle is DuckDB's native ASOF
    * JOIN with the inequality flipped to `p.ts <= c.ts`, which its
    * planner reads as "earliest c at-or-after p" — two entirely
    * different implementations, same rows. Purchases with no later
    * click drop (inner semantics), so the row count is a live part of
    * the gate. */
  val asof_forward = GQuery(
    "asof_forward",
    (s, d) => {
      import s.implicits._
      val e = T.events(s, d)
      val clicks = e.filter($"event_type" === "click")
        .groupBy($"user_id", $"ts")
        .agg(max($"event_id").as("click_id"))
      val purchases = e.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id".as("purchase_id"), $"value")
      graft.operators.AsOfJoin.asofForward(purchases, clicks,
          Seq("user_id"), "ts", "ts", Seq("click_id"))
        .select($"user_id", $"purchase_id", $"click_id", $"value")
        .orderBy($"purchase_id")
    },
    Some("""
      WITH clicks AS (
        SELECT user_id, ts, MAX(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      p AS (
        SELECT user_id, ts, event_id AS purchase_id, value
        FROM events WHERE event_type = 'purchase')
      SELECT p.user_id, p.purchase_id, c.click_id, p.value
      FROM p ASOF JOIN clicks c
        ON p.user_id = c.user_id AND p.ts <= c.ts
      ORDER BY purchase_id"""))

  /** Nearest as-of join: each purchase matched to the user's CLOSEST
    * click in either direction, ties to the earlier one — pandas
    * merge_asof direction='nearest', completing the as-of family
    * (backward = [[asof_attribution]], forward = [[asof_forward]]).
    * Spark side is [[graft.operators.AsOfJoin.asofNearest]]: ONE
    * union + ONE keyed exchange carrying both directional running
    * frames, the nearer picked per row by exact epoch-µs subtraction
    * (both sides pre-converted to longs, the range_join_window
    * precedent, so distances never touch timestamp arithmetic). The
    * oracle composes DuckDB's native ASOF LEFT JOIN twice — once per
    * inequality direction — and re-derives the same tie-to-backward
    * choice in a CASE over the two µs distances: structurally
    * different algorithm, same rows. The chosen direction and the
    * distance are both IN the gated output, so a wrong tie-break or
    * an off-by-one frame boundary flips hashes, not just row counts. */
  val asof_nearest = GQuery(
    "asof_nearest",
    (s, d) => {
      import s.implicits._
      val e = T.events(s, d)
        .withColumn("us", unix_micros($"ts".cast("timestamp")))
      val clicks = e.filter($"event_type" === "click")
        .groupBy($"user_id", $"us")
        .agg(max($"event_id").as("click_id"))
      val purchases = e.filter($"event_type" === "purchase")
        .select($"user_id", $"us", $"event_id".as("purchase_id"), $"value")
      graft.operators.AsOfJoin.asofNearest(purchases, clicks,
          Seq("user_id"), "us", "us", Seq("click_id"))
        .select($"user_id", $"purchase_id", $"click_id",
          $"asof_dir".as("direction"),
          $"asof_dist".cast("bigint").as("dist_us"), $"value")
        .orderBy($"purchase_id")
    },
    Some("""
      WITH clicks AS (
        SELECT user_id, epoch_us(ts) AS cus, MAX(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      p AS (
        SELECT user_id, epoch_us(ts) AS us, event_id AS purchase_id,
               value
        FROM events WHERE event_type = 'purchase'),
      b AS (
        SELECT p.purchase_id, c.click_id, c.cus
        FROM p ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.us >= c.cus),
      f AS (
        SELECT p.purchase_id, c.click_id, c.cus
        FROM p ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.us <= c.cus)
      SELECT p.user_id, p.purchase_id,
             CASE WHEN b.click_id IS NOT NULL AND (f.click_id IS NULL
                    OR (p.us - b.cus) <= (f.cus - p.us))
                  THEN b.click_id ELSE f.click_id END AS click_id,
             CASE WHEN b.click_id IS NOT NULL AND (f.click_id IS NULL
                    OR (p.us - b.cus) <= (f.cus - p.us))
                  THEN 'b' ELSE 'f' END AS direction,
             CAST(CASE WHEN b.click_id IS NOT NULL AND (f.click_id IS
                    NULL OR (p.us - b.cus) <= (f.cus - p.us))
                  THEN p.us - b.cus ELSE f.cus - p.us END AS BIGINT)
               AS dist_us,
             p.value
      FROM p
      JOIN b USING (purchase_id)
      JOIN f USING (purchase_id)
      WHERE b.click_id IS NOT NULL OR f.click_id IS NOT NULL
      ORDER BY purchase_id"""))

  /** Range/interval join: error events within one hour after a signup
    * of the same user. Spark side runs the binned equi-join composition
    * (graft.operators.RangeJoin — no nested-loop cross product); the
    * oracle is DuckDB's plain inequality join. Times in µs (see header
    * note). */
  val range_join_window = GQuery(
    "range_join_window",
    (s, d) => {
      import s.implicits._
      val hourUs = 3600L * 1000 * 1000
      // exact epoch-µs long, same header-note rationale as sessionize
      val e = T.events(s, d)
        .withColumn("us", unix_micros($"ts".cast("timestamp")))
      val signups = e.filter($"event_type" === "signup")
        .select($"user_id", $"event_id".as("signup_id"),
          $"us".as("lo"), ($"us" + hourUs).as("hi"))
      val errors = e.filter($"event_type" === "error")
        .select($"user_id", $"event_id".as("error_id"), $"us")
      graft.operators.RangeJoin.pointInInterval(errors, signups,
          Seq("user_id"), "us", "lo", "hi", hourUs)
        .select($"user_id", $"signup_id", $"error_id")
        .orderBy($"signup_id", $"error_id")
    },
    Some("""
      WITH s AS (
        SELECT user_id, event_id AS signup_id, epoch_us(ts) AS lo,
               epoch_us(ts) + 3600000000 AS hi
        FROM events WHERE event_type = 'signup'),
      e AS (
        SELECT user_id, event_id AS error_id, epoch_us(ts) AS us
        FROM events WHERE event_type = 'error')
      SELECT s.user_id, signup_id, error_id
      FROM e JOIN s ON e.user_id = s.user_id
        AND e.us >= s.lo AND e.us <= s.hi
      ORDER BY signup_id, error_id"""))

  /** Composed cleaning pipeline — the actual training-data flow in one
    * plan: quality-filter → fingerprint dedup (keep min doc_id) →
    * per-language survivor stats. Every stage is oracle-checked as a
    * unit elsewhere; this checks the composition. */
  val pipeline_e2e = GQuery(
    "pipeline_e2e",
    (s, d) => {
      import s.implicits._
      import graft.operators.{TextAnalysis => TA}
      val scored = T.documents(s, d)
        .withColumn("quality", TA.qualityScore($"text"))
        .withColumn("fp", TA.fingerprint($"text"))
        .filter($"quality" >= 0.5)
      val deduped = scored
        .groupBy($"fp")
        .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
      deduped
        .join(T.documents(s, d), Seq("doc_id"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_copies").as("n_before_dedup"),
          round(sum(dec($"n_chars", 0)).cast("double") /
            count(lit(1)).cast("double"), 6).as("avg_chars"))
        .orderBy($"lang")
    },
    Some("""
      WITH scored AS (
        SELECT doc_id, lang, n_chars,
               md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        FROM documents
        WHERE 0.25 * (CASE WHEN len(string_split(text,' ')) BETWEEN 20 AND 200
                      THEN 1.0 ELSE 0.0 END)
            + 0.25 * (CASE WHEN
                CAST(len(list_filter(string_split(text,' '),
                  t -> t IN ('the','a','of','and','to'))) AS DOUBLE)
                / len(string_split(text,' ')) BETWEEN 0.01 AND 0.6
                THEN 1.0 ELSE 0.0 END)
            + 0.25 * (CASE WHEN len(string_split(text,' ')) > 0 THEN
                CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
                / len(string_split(text,' ')) ELSE 0.0 END)
            + 0.25 * (CASE WHEN length(replace(text,' ','')) > 0 THEN
                CAST(len(regexp_extract_all(text,'[A-Za-z]')) AS DOUBLE)
                / length(replace(text,' ','')) ELSE 0.0 END) >= 0.5),
      deduped AS (
        SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        FROM scored GROUP BY fp)
      SELECT d.lang, COUNT(*) AS n_docs,
             CAST(SUM(n_copies) AS BIGINT) AS n_before_dedup,
             ROUND(CAST(SUM(CAST(d.n_chars AS DECIMAL(38,0))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 6) AS avg_chars
      FROM deduped JOIN documents d ON deduped.doc_id = d.doc_id
      GROUP BY d.lang ORDER BY d.lang"""))

  /** Conversion funnel: per user, ordered signup → first later click →
    * first later purchase; counts per stage. */
  val funnel = GQuery(
    "funnel",
    (s, d) => {
      import s.implicits._
      val e = T.events(s, d)
      def stage(t: String, name: String) =
        e.filter($"event_type" === t)
          .groupBy($"user_id").agg(min($"ts").as(name))
      val f = stage("signup", "t_signup")
        .join(stage("click", "t_click"), Seq("user_id"), "left_outer")
        .join(stage("purchase", "t_purchase"), Seq("user_id"), "left_outer")
      f.select(
          count(lit(1)).as("n_signup"),
          sum(when($"t_click" > $"t_signup", 1L).otherwise(0L))
            .as("n_click_after_signup"),
          sum(when($"t_purchase" > $"t_click" &&
            $"t_click" > $"t_signup", 1L).otherwise(0L))
            .as("n_full_funnel"))
    },
    Some("""
      WITH s AS (SELECT user_id, MIN(ts) AS t_signup FROM events
                 WHERE event_type = 'signup' GROUP BY user_id),
      c AS (SELECT user_id, MIN(ts) AS t_click FROM events
            WHERE event_type = 'click' GROUP BY user_id),
      p AS (SELECT user_id, MIN(ts) AS t_purchase FROM events
            WHERE event_type = 'purchase' GROUP BY user_id)
      SELECT COUNT(*) AS n_signup,
             CAST(SUM(CASE WHEN t_click > t_signup THEN 1 ELSE 0 END) AS BIGINT)
               AS n_click_after_signup,
             CAST(SUM(CASE WHEN t_purchase > t_click AND t_click > t_signup
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
      FROM s LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)"""))

  /** Pure-SQL surface: a TPC-H Q3-shaped query submitted as SQL text
    * over registered views — Catalyst parses, decorrelates and reorders
    * it like any DataFrame plan (identical SQL runs on the oracle). */
  val sql_shipping_priority = GQuery(
    "sql_shipping_priority",
    (s, d) => {
      graft.Views.register(s, d)
      // The fact table (lineitem) must be the streaming side: the
      // orders⋈customer subquery shrinks through the segment filter to
      // dimension size, so it is the broadcast build side (hinted —
      // without it Spark's size estimate can pick lineitem as the build
      // side, a plan that dies at real scale).
      s.sql("""
        SELECT /*+ BROADCAST(o) */ o_orderkey,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                 AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
               o_orderdate_s, o_orderpriority
        FROM lineitem
        JOIN (SELECT o_orderkey,
                     date_format(o_orderdate, 'yyyy-MM-dd') AS o_orderdate_s,
                     o_orderpriority
              FROM orders JOIN customer ON c_custkey = o_custkey
              WHERE c_mktsegment = 'BUILDING') o
          ON l_orderkey = o_orderkey
        GROUP BY o_orderkey, o_orderdate_s, o_orderpriority
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10""")
    },
    Some("""
      SELECT o_orderkey,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
               AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
             strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
             o_orderpriority
      FROM orders
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN customer ON c_custkey = o_custkey
      WHERE c_mktsegment = 'BUILDING'
      GROUP BY o_orderkey, o_orderdate_s, o_orderpriority
      ORDER BY revenue DESC, o_orderkey
      LIMIT 10"""))

  private def dec(c: org.apache.spark.sql.Column, scale: Int) =
    c.cast(org.apache.spark.sql.types.DecimalType(38, scale))

  /** Pivot: long→wide per-user event-type counts (the DataFrame
    * `.pivot()` operator; the oracle spells the same contract as CASE
    * sums). */
  val pivot_events = GQuery(
    "pivot_events",
    (s, d) => {
      import s.implicits._
      T.events(s, d)
        .groupBy($"user_id")
        .pivot($"event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy($"user_id")
    },
    Some("""
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
      FROM events GROUP BY user_id ORDER BY user_id"""))

  /** Incremental materialized-view maintenance over the
    * (user_id, event_type) COUNT/SUM view: the base view is
    * materialized to parquet, then two SIGNED delta batches
    * (inserts + retracts, [[graft.operators.IVM]]) are applied,
    * each refresh reading ONLY the previous view table and its delta
    * — base facts are never rescanned. Batch composition (all
    * predicates on event_id, so the oracle replays the identical
    * signed multiset): base = 80% of events; delta 1 inserts half the
    * holdout and retracts base rows ≡3 mod 7; delta 2 inserts the
    * other half and retracts ≡5 mod 7 — plus ALL remaining rows of
    * the (user_id<3, 'signup') groups, whose inserts are excluded
    * from both deltas, so those groups hit signed count 0 and must
    * LEAVE the view (the group-drop path is exercised, not just
    * claimed). DECIMAL(38,12) sums make incremental ≡ from-scratch an
    * exact-equality gate; the oracle is the from-scratch signed
    * recompute. */
  val ivm_agg_refresh = GQuery(
    "ivm_agg_refresh",
    (s, d) => graft.GQuery.withTempTable(s, "graft-ivm") { dir =>
      import graft.operators.IVM
      import s.implicits._
      val keys = Seq("user_id", "event_type")
      val ev = T.events(s, d)
        .select($"event_id", $"user_id", $"event_type", $"value")
      val g = $"user_id" < 3L && $"event_type" === "signup"
      val base = ev.filter($"event_id" % 5 =!= 4L)
      val d1 = ev.filter($"event_id" % 5 === 4L &&
            $"event_id" % 2 === 0L && !g)
          .withColumn("op", lit(1))
        .unionByName(base.filter($"event_id" % 7 === 3L)
          .withColumn("op", lit(-1)))
      val d2 = ev.filter($"event_id" % 5 === 4L &&
            $"event_id" % 2 === 1L && !g)
          .withColumn("op", lit(1))
        .unionByName(base.filter($"event_id" % 7 === 5L ||
            (g && $"event_id" % 7 =!= 3L && $"event_id" % 7 =!= 5L))
          .withColumn("op", lit(-1)))
      IVM.init(base, keys, "value").write.parquet(s"$dir/v0")
      IVM.refresh(s.read.parquet(s"$dir/v0"),
        d1.select($"user_id", $"event_type", $"op", $"value"), keys,
        "value").write.parquet(s"$dir/v1")
      IVM.refresh(s.read.parquet(s"$dir/v1"),
        d2.select($"user_id", $"event_type", $"op", $"value"), keys,
        "value")
        .select($"user_id", $"event_type", $"n",
          round($"val_dec".cast("double"), 6).as("val_sum"))
        .orderBy($"user_id", $"event_type")
    },
    Some("""
      WITH ev AS (SELECT event_id, user_id, event_type, value
                  FROM events),
      base AS (SELECT user_id, event_type, 1 AS op, value
               FROM ev WHERE event_id % 5 <> 4),
      signed AS (
        SELECT * FROM base
        UNION ALL
        SELECT user_id, event_type, 1, value FROM ev
        WHERE event_id % 5 = 4 AND event_id % 2 = 0
          AND NOT (user_id < 3 AND event_type = 'signup')
        UNION ALL
        SELECT user_id, event_type, -1, value FROM ev
        WHERE event_id % 5 <> 4 AND event_id % 7 = 3
        UNION ALL
        SELECT user_id, event_type, 1, value FROM ev
        WHERE event_id % 5 = 4 AND event_id % 2 = 1
          AND NOT (user_id < 3 AND event_type = 'signup')
        UNION ALL
        SELECT user_id, event_type, -1, value FROM ev
        WHERE event_id % 5 <> 4
          AND (event_id % 7 = 5 OR
               (user_id < 3 AND event_type = 'signup'
                AND event_id % 7 <> 3 AND event_id % 7 <> 5)))
      SELECT user_id, event_type, CAST(SUM(op) AS BIGINT) AS n,
             ROUND(CAST(SUM(CAST(value * op AS DECIMAL(38,12)))
               AS DOUBLE), 6) AS val_sum
      FROM signed GROUP BY 1, 2 HAVING SUM(op) > 0
      ORDER BY user_id, event_type"""))

  /** Incremental maintenance of a JOIN view — the delta-join algebra
    * that [[ivm_agg_refresh]]'s single-table form doesn't cover: the
    * view is γ_custkey(lineitem ⋈ orders) (per-customer revenue), and
    * each refresh applies a SIGNED lineitem delta by computing
    * ΔV = γ(ΔL ⋈ O) and merging it with the same co-keyed full-outer
    * merge ([[graft.operators.IVM.refresh]] after the enrichment
    * join). One-sided deltas are the production fact-table shape
    * (facts append and correct; the dimension is stable): base
    * lineitem is NEVER rescanned after init — refresh touches the
    * delta, the dimension rows the delta's keys probe (a keyed
    * equi-join; with a day's delta against a year's facts that is the
    * entire point), and the group-cardinality view. Retract+insert
    * pairs model corrections, exactly as in ivm_agg_refresh; revenue
    * rides DECIMAL(38,12) so the two-refresh chain is BIT-equal to
    * the from-scratch recompute over the signed multiset — which is
    * the oracle: one SQL query over the same slice definitions
    * (row id = l_orderkey·8 + l_linenumber, both engines integral).
    * A group whose signed count reaches 0 leaves the view. */
  val ivm_join_refresh = GQuery(
    "ivm_join_refresh",
    (s, d) => graft.GQuery.withTempTable(s, "graft-ivm-join") { dir =>
      import graft.operators.IVM
      import s.implicits._
      val o = T.orders(s, d).select($"o_orderkey", $"o_custkey")
      val li = T.lineitem(s, d)
        .withColumn("rid", $"l_orderkey" * 8L + $"l_linenumber")
        .withColumn("rev", $"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .select($"rid", $"l_orderkey", $"rev")
      def enrich(df: org.apache.spark.sql.DataFrame) =
        df.join(o, df("l_orderkey") === o("o_orderkey"))
      val base = li.filter($"rid" % 5 =!= 4L)
      val d1 = li.filter($"rid" % 5 === 4L && $"rid" % 2 === 0L)
          .withColumn("op", lit(1))
        .unionByName(base.filter($"rid" % 7 === 3L)
          .withColumn("op", lit(-1)))
      val d2 = li.filter($"rid" % 5 === 4L && $"rid" % 2 === 1L)
          .withColumn("op", lit(1))
        .unionByName(base.filter($"rid" % 7 === 5L)
          .withColumn("op", lit(-1)))
      IVM.init(enrich(base), Seq("o_custkey"), "rev")
        .write.parquet(s"$dir/v0")
      IVM.refresh(s.read.parquet(s"$dir/v0"),
        enrich(d1).select($"o_custkey", $"op", $"rev"),
        Seq("o_custkey"), "rev").write.parquet(s"$dir/v1")
      IVM.refresh(s.read.parquet(s"$dir/v1"),
        enrich(d2).select($"o_custkey", $"op", $"rev"),
        Seq("o_custkey"), "rev")
        .select($"o_custkey", $"n",
          round($"val_dec".cast("double"), 6).as("rev_sum"))
        .orderBy($"o_custkey")
    },
    Some("""
      WITH li AS (
        SELECT l_orderkey, l_orderkey * 8 + l_linenumber AS rid,
               l_extendedprice * (1 - l_discount) AS rev
        FROM lineitem),
      signed AS (
        SELECT l_orderkey, 1 AS op, rev FROM li WHERE rid % 5 <> 4
        UNION ALL
        SELECT l_orderkey, 1, rev FROM li
        WHERE rid % 5 = 4 AND rid % 2 = 0
        UNION ALL
        SELECT l_orderkey, -1, rev FROM li
        WHERE rid % 5 <> 4 AND rid % 7 = 3
        UNION ALL
        SELECT l_orderkey, 1, rev FROM li
        WHERE rid % 5 = 4 AND rid % 2 = 1
        UNION ALL
        SELECT l_orderkey, -1, rev FROM li
        WHERE rid % 5 <> 4 AND rid % 7 = 5)
      SELECT o_custkey, CAST(SUM(op) AS BIGINT) AS n,
             ROUND(CAST(SUM(CAST(rev * op AS DECIMAL(38,12)))
               AS DOUBLE), 6) AS rev_sum
      FROM signed JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1 HAVING SUM(op) > 0
      ORDER BY o_custkey"""))

  /** [[ivm_agg_refresh]] maintained by REAL streaming execution: the
    * two signed delta batches arrive as a file-source stream
    * (maxFilesPerTrigger=1 → one micro-batch per delta) and
    * `foreachBatch` folds each into the parquet view via
    * [[graft.operators.IVM.refresh]] — the Spark shape of a
    * Flink-style continuously-maintained materialized view. The view
    * version is keyed by batchId (`view/v{id+1}`, overwrite), so a
    * replayed batch after a crash rewrites the same version instead
    * of double-applying — the idempotent-sink contract the K1–K3
    * sinks pin in RecoverySpec. Because the refresh algebra is
    * commutative/associative (exact counts + DECIMAL sums; drops only
    * materialize in the final read), delta arrival order cannot
    * change the result — which is why ONE oracle (the from-scratch
    * signed recompute, shared verbatim with the batch form) gates
    * both execution paths. */
  val stream_ivm_refresh = GQuery(
    "stream_ivm_refresh",
    (s, d) => graft.GQuery.withTempTable(s, "graft-stream-ivm") { t =>
      import graft.operators.IVM
      import s.implicits._
      val keys = Seq("user_id", "event_type")
      val ev = T.events(s, d)
        .select($"event_id", $"user_id", $"event_type", $"value")
      val g = $"user_id" < 3L && $"event_type" === "signup"
      val base = ev.filter($"event_id" % 5 =!= 4L)
      val d1 = ev.filter($"event_id" % 5 === 4L &&
            $"event_id" % 2 === 0L && !g)
          .withColumn("op", lit(1))
        .unionByName(base.filter($"event_id" % 7 === 3L)
          .withColumn("op", lit(-1)))
        .select($"user_id", $"event_type", $"op", $"value")
      val d2 = ev.filter($"event_id" % 5 === 4L &&
            $"event_id" % 2 === 1L && !g)
          .withColumn("op", lit(1))
        .unionByName(base.filter($"event_id" % 7 === 5L ||
            (g && $"event_id" % 7 =!= 3L && $"event_id" % 7 =!= 5L))
          .withColumn("op", lit(-1)))
        .select($"user_id", $"event_type", $"op", $"value")
      IVM.init(base, keys, "value").write.parquet(s"$t/view/v0")
      d1.coalesce(1).write.parquet(s"$t/in")
      d2.coalesce(1).write.mode("append").parquet(s"$t/in")
      @volatile var cur = s"$t/view/v0"
      val q = s.readStream
        .schema(s.read.parquet(s"$t/in").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$t/in")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], id: Long) =>
          val next = s"$t/view/v${id + 1}"
          IVM.refresh(s.read.parquet(cur), batch, keys, "value")
            .write.mode("overwrite").parquet(next)
          cur = next
        }
        .option("checkpointLocation", s"$t/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(cur)
        .select($"user_id", $"event_type", $"n",
          round($"val_dec".cast("double"), 6).as("val_sum"))
        .orderBy($"user_id", $"event_type")
    },
    ivm_agg_refresh.oracle)

  // ------------------------------------------------------------ r10b
  /** Time-weighted average per (event_type, day) — the metric a
    * monitoring pipeline wants when observations are irregular (a
    * plain AVG over-weights bursty periods): each observation holds
    * its value until the next one, the last until midnight, so
    * TWAP = Σ v·Δt / Σ Δt over the hold segments. The hold duration
    * is `lead(us) − us` within the (type, day) partition (ties on us
    * break by event_id, giving the earlier tied row a zero-length
    * hold — pinned, not incidental), and coverage runs from the FIRST
    * observation to midnight (no backfill before it — the resample
    * family owns that semantics).
    *
    * Exactness: v·Δt reaches 2.9e19 per row (micro-value × µs), past
    * 2^63 — the product is widened to DECIMAL(38,0)/HUGEINT BEFORE
    * the sum (drift_chi2 rule); the single double division at the end
    * is `round`ed to 6. One window (lead) and one aggregate over the
    * same (type, day) partitioning — day-bounded partitions, one
    * exchange, no self-join. */
  val twap = GQuery(
    "twap",
    (s, d) => {
      import s.implicits._
      val D = 86400000000L
      val ev = T.events(s, d)
        .withColumn("us", unix_micros($"ts".cast("timestamp")))
        .select($"event_type", $"event_id", $"us",
          expr(s"us DIV ${D}L").as("day"),
          floor($"value" * 1000000d + 0.5d).cast("long").as("vm"))
      val w = Window.partitionBy($"event_type", $"day")
        .orderBy($"us", $"event_id")
      val seg = ev.withColumn("dur",
        coalesce(lead($"us", 1).over(w), ($"day" + 1L) * D) - $"us")
      seg.groupBy($"event_type", $"day")
        .agg(count(lit(1)).as("n"),
          sum($"vm".cast("decimal(38,0)") * $"dur".cast("decimal(38,0)"))
            .as("num"),
          sum($"dur").as("den_us"))
        .select($"event_type", $"day", $"n", $"den_us",
          round($"num".cast("double") / $"den_us".cast("double") /
            1000000d, 6).as("twap_val"))
        .orderBy($"event_type", $"day")
    },
    Some("""
      WITH ev AS (
        SELECT event_type, event_id, epoch_us(ts) AS us,
               epoch_us(ts) // 86400000000 AS day,
               CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS vm
        FROM events),
      seg AS (
        SELECT event_type, day, vm,
               COALESCE(LEAD(us) OVER (
                   PARTITION BY event_type, day
                   ORDER BY us, event_id),
                 (day + 1) * 86400000000) - us AS dur
        FROM ev)
      SELECT event_type, day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(dur) AS BIGINT) AS den_us,
             ROUND(CAST(SUM(CAST(vm AS HUGEINT) * CAST(dur AS HUGEINT))
                     AS DOUBLE)
                   / CAST(SUM(dur) AS DOUBLE) / 1000000, 6) AS twap_val
      FROM seg GROUP BY event_type, day
      ORDER BY event_type, day"""))

  /** DuckDB spelling of the aHash pipeline over a parameterized image
    * catalog CTE `c(id, w, h, seed)` — the full raster algebra
    * rebuilt relationally: sampled byte index base = 7·(3·(sy·w+sx))
    * + seed with sy = y·h//8, sx = x·w//8, g = Σ of three consecutive
    * sawtooth bytes, bit = 64·g ≥ Σg, bands = 16-bit packs. */
  /** `p` prefixes every CTE name so several modality chains can share
    * one WITH clause (the composed-release oracle); default "" keeps
    * the single-modality oracles byte-identical. */
  private def phashSql(catalogCte: String, p: String = ""): String = s"""
      WITH ${p}c AS ($catalogCte),
      ${p}cell AS (
        SELECT id, w, h, seed,
               j.range // 8 AS y, j.range % 8 AS x
        FROM ${p}c, range(64) j),
      ${p}gcell AS (
        SELECT id, y * 8 + x AS idx,
               (b % 256) + ((b + 7) % 256) + ((b + 14) % 256) AS g
        FROM (
          SELECT id, y, x,
                 7 * (3 * ((y * h // 8) * w + (x * w // 8))) + seed
                   AS b
          FROM ${p}cell)),
      ${p}tot AS (SELECT id, SUM(g) AS t FROM ${p}gcell GROUP BY id),
      ${p}bits AS (
        SELECT g.id, g.idx,
               CASE WHEN g.g * 64 >= ${p}tot.t THEN 1 ELSE 0 END AS bit
        FROM ${p}gcell g JOIN ${p}tot ON g.id = ${p}tot.id),
      ${p}bandv AS (
        SELECT id, idx // 16 AS bk,
               CAST(SUM((CAST(1 AS BIGINT) << (idx % 16)) * bit)
                 AS BIGINT) AS bv
        FROM ${p}bits GROUP BY id, idx // 16)"""

  /** Per-image perceptual hash — the decode→sample→threshold pipeline
    * gated bit-for-bit against a pure-SQL rebuild of the raster
    * algebra (the mm_feature_extract discipline applied to aHash):
    * the real PPM codec path on the Spark side, integer sawtooth
    * arithmetic on the oracle side, one 64-bit fingerprint per image
    * that must agree exactly. Scan-bound: one decode per image, no
    * shuffle before the per-image hash row. */
  val mm_phash = GQuery(
    "mm_phash",
    (s, d) => {
      import s.implicits._
      Multimodal.perceptualHash(
          Multimodal.toPpm(T.documents(s, d), "doc_id", "text"))
        .select($"media_id", $"w", $"h",
          ($"b1" * 65536L + $"b0").as("hash_lo"),
          ($"b3" * 65536L + $"b2").as("hash_hi"), $"n_ones")
        .orderBy($"media_id")
    },
    Some(phashSql("""
        SELECT doc_id AS id,
               CAST(8 + doc_id % 8 AS BIGINT) AS w,
               CAST(8 + octet_length(encode(text)) % 5 AS BIGINT) AS h,
               13 * doc_id AS seed
        FROM documents""") + """
      , hash AS (
        SELECT id,
               CAST(SUM(CASE WHEN bk < 2
                 THEN bv * (CAST(1 AS BIGINT) << (bk * 16))
                 ELSE 0 END) AS BIGINT) AS hash_lo,
               CAST(SUM(CASE WHEN bk >= 2
                 THEN bv * (CAST(1 AS BIGINT) << ((bk - 2) * 16))
                 ELSE 0 END) AS BIGINT) AS hash_hi
        FROM bandv GROUP BY id),
      ones AS (
        SELECT id, CAST(SUM(bit) AS BIGINT) AS n_ones
        FROM bits GROUP BY id)
      SELECT c.id AS media_id, CAST(c.w AS INT) AS w,
             CAST(c.h AS INT) AS h, hash_lo, hash_hi, n_ones
      FROM c JOIN hash ON c.id = hash.id
             JOIN ones ON c.id = ones.id
      ORDER BY media_id"""))

  /** Perceptual near-dup image pairs at Hamming ≤ 3 — multimodal
    * dedup through the banded aHash join: candidates share an EXACT
    * 16-bit band (recall 1.0 at this radius BY PIGEONHOLE — 4 bands
    * cannot all differ across ≤3 bit flips — so unlike the minhash
    * families no recall gate is needed; the blocking is lossless, a
    * theorem), then exact Hamming verification on the band columns.
    * Every 10th image plants a BYTE-IDENTICAL twin under the
    * sign-flipped id (the re-upload case: same payload, new identity
    * — the ADVICE-r9 collision-free plant rule), whose detection at
    * Hamming 0 is likewise guaranteed; organic collisions surface
    * alongside and both engines must agree on the full pair table.
    *
    * SCALE FENCE (priced in the r11 sweep: 11.93×/decade-1): under
    * content saturation — a corpus whose distinct-image space stops
    * growing while uploads keep coming, exactly what MkScale's
    * replication models — duplicate classes fatten linearly, so the
    * PAIR SET this query materializes grows QUADRATICALLY; no banding
    * knob fixes an output that is itself quadratic. This query is the
    * exact enumeration fence; [[mm_dedup_phash_canonical]] is the
    * production path (collapse exact-hash classes first, pair only
    * canonicals), carrying the same information linearly. */
  val mm_dedup_phash = GQuery(
    "mm_dedup_phash",
    (s, d) => {
      import s.implicits._
      val media = Multimodal.toPpm(T.documents(s, d), "doc_id", "text")
      val plants = media.filter($"media_id" % 10 === 0L)
        .withColumn("media_id", -$"media_id" - 1L)
      // hashed once; consumed by the band explode AND both verify
      // joins (the collocations_pmi re-plan lesson)
      val hashes = Multimodal.perceptualHash(media.unionByName(plants))
        .localCheckpoint()
      val bands = hashes.select($"media_id",
        posexplode(array($"b0", $"b1", $"b2", $"b3")).as(Seq("bk", "bv")))
      val cand = bands.alias("a").join(bands.alias("b"),
          col("a.bk") === col("b.bk") && col("a.bv") === col("b.bv") &&
            col("a.media_id") < col("b.media_id"))
        .select(col("a.media_id").as("d1"), col("b.media_id").as("d2"))
        .distinct()
      val hx = hashes.select($"media_id", $"b0", $"b1", $"b2", $"b3")
      cand
        .join(hx.toDF("d1", "a0", "a1", "a2", "a3"), "d1")
        .join(hx.toDF("d2", "c0", "c1", "c2", "c3"), "d2")
        .select($"d1", $"d2",
          (bit_count($"a0".bitwiseXOR($"c0")) +
            bit_count($"a1".bitwiseXOR($"c1")) +
            bit_count($"a2".bitwiseXOR($"c2")) +
            bit_count($"a3".bitwiseXOR($"c3"))).cast("long")
            .as("hamming"))
        .filter($"hamming" <= 3L)
        .orderBy($"d1", $"d2")
    },
    Some(phashSql("""
        SELECT doc_id AS id,
               CAST(8 + doc_id % 8 AS BIGINT) AS w,
               CAST(8 + octet_length(encode(text)) % 5 AS BIGINT) AS h,
               13 * doc_id AS seed
        FROM documents
        UNION ALL
        SELECT -doc_id - 1 AS id,
               CAST(8 + doc_id % 8 AS BIGINT) AS w,
               CAST(8 + octet_length(encode(text)) % 5 AS BIGINT) AS h,
               13 * doc_id AS seed
        FROM documents WHERE doc_id % 10 = 0""") + """
      , cand AS (
        SELECT DISTINCT a.id AS d1, b.id AS d2
        FROM bandv a JOIN bandv b
          ON a.bk = b.bk AND a.bv = b.bv AND a.id < b.id),
      scored AS (
        SELECT d1, d2,
               CAST(SUM(bit_count(xor(x.bv, y.bv))) AS BIGINT)
                 AS hamming
        FROM cand
        JOIN bandv x ON x.id = d1
        JOIN bandv y ON y.id = d2 AND y.bk = x.bk
        GROUP BY d1, d2)
      SELECT d1, d2, hamming FROM scored
      WHERE hamming <= 3 ORDER BY d1, d2"""))

  /** The mm_dedup_phash PRODUCTION path under content saturation —
    * exact-hash classes collapse FIRST (one map-side-combinable
    * aggregate over the linear hash stream: canonical = min id, n =
    * class size), then the Hamming ≤ 3 banded join runs over the
    * CLASS table, whose cardinality is bounded by content diversity
    * (distinct images), not corpus size. The output carries the SAME
    * information as the exact pair enumeration, linearly: a self row
    * per fat class (hamming 0, pair_mass = n·(n−1) DIV 2) and a cross
    * row per close class pair (pair_mass = n1·n2) — Σ pair_mass
    * equals mm_dedup_phash's row count exactly (reconciliation pinned
    * in Round11Spec), because every near-dup pair is either within a
    * class (hash-identical ⇒ Hamming 0) or between two classes whose
    * canonical Hamming is the pair's Hamming (all class members share
    * one hash). The oracle brute-forces ALL class pairs (no banding
    * anywhere in the SQL — two algorithms, one answer); the Spark
    * side keeps the pigeonhole-banded candidate join. Overflow:
    * pair_mass = n1·n2 ≤ (corpus)² requires BIGINT, exact to 2⁶³. */
  val mm_dedup_phash_canonical = GQuery(
    "mm_dedup_phash_canonical",
    (s, d) => {
      import s.implicits._
      val media = Multimodal.toPpm(T.documents(s, d), "doc_id", "text")
      val plants = media.filter($"media_id" % 10 === 0L)
        .withColumn("media_id", -$"media_id" - 1L)
      val classes = Multimodal.perceptualHash(media.unionByName(plants))
        .groupBy($"b0", $"b1", $"b2", $"b3")
        .agg(min($"media_id").as("canon"), count(lit(1)).as("n"))
        .localCheckpoint()
      val bands = classes.select($"canon",
        posexplode(array($"b0", $"b1", $"b2", $"b3")).as(Seq("bk", "bv")))
      val cand = bands.alias("a").join(bands.alias("b"),
          col("a.bk") === col("b.bk") && col("a.bv") === col("b.bv") &&
            col("a.canon") < col("b.canon"))
        .select(col("a.canon").as("c1"), col("b.canon").as("c2"))
        .distinct()
      val hx = classes.select($"canon", $"b0", $"b1", $"b2", $"b3", $"n")
      val cross = cand
        .join(hx.toDF("c1", "a0", "a1", "a2", "a3", "n1"), "c1")
        .join(hx.toDF("c2", "x0", "x1", "x2", "x3", "n2"), "c2")
        .select($"c1", $"c2",
          (bit_count($"a0".bitwiseXOR($"x0")) +
            bit_count($"a1".bitwiseXOR($"x1")) +
            bit_count($"a2".bitwiseXOR($"x2")) +
            bit_count($"a3".bitwiseXOR($"x3"))).cast("long")
            .as("hamming"),
          ($"n1" * $"n2").as("pair_mass"))
        .filter($"hamming" <= 3L)
      val self = classes.filter($"n" > 1L)
        .select($"canon".as("c1"), $"canon".as("c2"),
          lit(0L).as("hamming"),
          expr("(n * (n - 1)) DIV 2").as("pair_mass"))
      cross.unionByName(self).orderBy($"c1", $"c2")
    },
    Some(phashSql("""
        SELECT doc_id AS id,
               CAST(8 + doc_id % 8 AS BIGINT) AS w,
               CAST(8 + octet_length(encode(text)) % 5 AS BIGINT) AS h,
               13 * doc_id AS seed
        FROM documents
        UNION ALL
        SELECT -doc_id - 1 AS id,
               CAST(8 + doc_id % 8 AS BIGINT) AS w,
               CAST(8 + octet_length(encode(text)) % 5 AS BIGINT) AS h,
               13 * doc_id AS seed
        FROM documents WHERE doc_id % 10 = 0""") + """
      , hash AS (
        SELECT id,
               MAX(CASE WHEN bk = 0 THEN bv END) AS b0,
               MAX(CASE WHEN bk = 1 THEN bv END) AS b1,
               MAX(CASE WHEN bk = 2 THEN bv END) AS b2,
               MAX(CASE WHEN bk = 3 THEN bv END) AS b3
        FROM bandv GROUP BY id),
      classes AS (
        SELECT b0, b1, b2, b3, MIN(id) AS canon,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM hash GROUP BY b0, b1, b2, b3),
      crossed AS (
        SELECT a.canon AS c1, b.canon AS c2,
               CAST(bit_count(xor(a.b0, b.b0))
                  + bit_count(xor(a.b1, b.b1))
                  + bit_count(xor(a.b2, b.b2))
                  + bit_count(xor(a.b3, b.b3)) AS BIGINT) AS hamming,
               CAST(a.n * b.n AS BIGINT) AS pair_mass
        FROM classes a JOIN classes b ON a.canon < b.canon),
      selfrows AS (
        SELECT canon AS c1, canon AS c2,
               CAST(0 AS BIGINT) AS hamming,
               CAST((n * (n - 1)) // 2 AS BIGINT) AS pair_mass
        FROM classes WHERE n > 1)
      SELECT c1, c2, hamming, pair_mass FROM crossed WHERE hamming <= 3
      UNION ALL
      SELECT c1, c2, hamming, pair_mass FROM selfrows
      ORDER BY c1, c2"""))

  val all: Seq[GQuery] = Seq(sessionize, scd2_islands, schema_evolution,
    table_diff, json_corrupt_routing, resample_ffill, resample_interp,
    twap,
    agg_mode, ivm_agg_refresh, ivm_join_refresh,
    stream_ivm_refresh, agg_cube,
    mm_binary_meta,
    mm_feature_extract, mm_frame_sample, mm_resize,
    mm_phash, mm_dedup_phash, mm_dedup_phash_canonical,
    mm_audio_meta, mm_audio_downsample,
    mm_audio_hash, mm_dedup_audio_canonical,
    mm_phash_shift_recall, mm_audio_gain_recall,
    mm_video_meta, mm_video_frame_hash, mm_video_scenecut,
    mm_dedup_video_canonical, mm_video_shift_recall, mm_release_e2e,
    agg_approx_distinct, ml_kmeans_profiles, ml_kmeans_contract,
    ml_quadfit_contract, ml_pca_contract, set_ops, w2_rank_lag,
    j6_outer_join, asof_attribution, asof_forward, asof_nearest,
    range_join_window,
    pipeline_e2e,
    funnel, sql_shipping_priority, pivot_events)
}
