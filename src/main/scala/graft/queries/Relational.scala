package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{GQuery, Tables => T}

/** Second wave of relational surface: multidimensional grouping
  * (rollup / grouping sets), unpivot, distribution window functions,
  * exact interpolated percentiles, string algebra, and higher-order
  * array functions — each hash-checked against the DuckDB oracle.
  *
  * NULL group-indicator columns from rollup/grouping-sets are
  * COALESCEd to a sentinel on both sides so canonicalization never
  * depends on engine NULL-ordering.
  */
object Relational {

  private def dec(c: org.apache.spark.sql.Column, scale: Int) =
    c.cast(org.apache.spark.sql.types.DecimalType(38, scale))

  /** ROLLUP over (priority, status): per-group, per-priority subtotal
    * and grand total in one pass (Expand + single shuffle — no
    * self-union of three aggregations). */
  val agg_rollup = GQuery(
    "agg_rollup",
    (s, d) => {
      import s.implicits._
      T.orders(s, d)
        .rollup($"o_orderpriority", $"o_orderstatus")
        .agg(count(lit(1)).as("n"),
          dec(sum(dec($"o_totalprice", 4)), 4).cast("double").as("total"))
        .select(coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          coalesce($"o_orderstatus", lit("ALL")).as("status"),
          $"n", $"total")
        .orderBy($"priority", $"status")
    },
    Some("""
      SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
             COALESCE(o_orderstatus, 'ALL') AS status,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
               AS DECIMAL(38,4)) AS DOUBLE) AS total
      FROM orders
      GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
      ORDER BY priority, status"""))

  /** GROUPING SETS ((priority), (status)): two independent groupings in
    * one Expand pass instead of two scans + union. */
  val agg_grouping_sets = GQuery(
    "agg_grouping_sets",
    (s, d) => {
      graft.Views.register(s, d)
      s.sql("""
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(o_orderstatus, 'ALL') AS status,
               COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        ORDER BY priority, status""")
    },
    Some("""
      SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
             COALESCE(o_orderstatus, 'ALL') AS status,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders
      GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
      ORDER BY priority, status"""))

  /** Unpivot (wide→long): four lineitem measures melted to (metric,
    * value) rows, re-aggregated per metric. The melt is a zero-shuffle
    * Expand; only the final 4-group agg exchanges. */
  val unpivot_measures = GQuery(
    "unpivot_measures",
    (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .unpivot(Array($"l_orderkey"),
          Array($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax"),
          "metric", "value")
        .groupBy($"metric")
        .agg(count(lit(1)).as("n"),
          dec(sum(dec($"value", 4)), 4).cast("double").as("total"))
        .orderBy($"metric")
    },
    Some("""
      SELECT metric, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(38,4)))
               AS DECIMAL(38,4)) AS DOUBLE) AS total
      FROM (
        SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT 'l_discount', l_discount FROM lineitem
        UNION ALL
        SELECT 'l_tax', l_tax FROM lineitem)
      GROUP BY metric ORDER BY metric"""))

  /** Distribution window functions: ntile / percent_rank / cume_dist
    * per priority partition, deterministically tie-broken. */
  val w3_distribution = GQuery(
    "w3_distribution",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice", $"o_orderkey")
      T.orders(s, d).select(
        $"o_orderkey", $"o_orderpriority",
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_orderpriority,
             CAST(NTILE(4) OVER w AS INT) AS quartile,
             ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
             ROUND(CUME_DIST() OVER w, 6) AS cume
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_orderkey"""))

  /** Exact interpolated percentiles (p25/p50/p75 of l_quantity per
    * return flag) — Spark `percentile` and DuckDB `quantile_cont` share
    * the linear-interpolation definition. */
  val agg_percentiles = GQuery(
    "agg_percentiles",
    (s, d) => {
      import s.implicits._
      val ps = expr(
        "percentile(l_quantity, array(0.25D, 0.5D, 0.75D))")
      T.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(round(element_at(ps, 1), 6).as("p25"),
          round(element_at(ps, 2), 6).as("p50"),
          round(element_at(ps, 3), 6).as("p75"))
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
             ROUND(quantile_cont(l_quantity, 0.25), 6) AS p25,
             ROUND(quantile_cont(l_quantity, 0.50), 6) AS p50,
             ROUND(quantile_cont(l_quantity, 0.75), 6) AS p75
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Sketch-family percentile (percentile_approx) with its accuracy
    * contract hash-checked, mirroring agg_approx_distinct: the oracle
    * pins the exact interpolated quantile and a boolean asserts the
    * sketch landed within 5% (relative). */
  val agg_approx_percentile = GQuery(
    "agg_approx_percentile",
    (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5D)"), 6).as("p50_exact"),
          expr("percentile_approx(l_quantity, 0.5D, 10000)")
            .as("p50_approx"))
        .select($"l_returnflag", $"p50_exact",
          (abs($"p50_approx" - $"p50_exact") <=
            greatest(abs($"p50_exact"), lit(1.0)) * lit(0.05))
            .as("approx_ok"))
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
             ROUND(quantile_cont(l_quantity, 0.50), 6) AS p50_exact,
             TRUE AS approx_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** String algebra over documents: length / case / reverse / substring
    * / edit distance / first-token extraction — all codegen'd
    * built-ins, no UDFs. */
  val str_funcs = GQuery(
    "str_funcs",
    (s, d) => {
      import s.implicits._
      T.documents(s, d).select(
        $"doc_id",
        length($"text").as("len"),
        upper(substring($"text", 1, 12)).as("head_u"),
        reverse(lower(substring($"text", 1, 8))).as("tail_r"),
        levenshtein(substring($"text", 1, 16), lit("training data is"))
          .as("lev"),
        element_at(split($"text", " "), 1).as("w1"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST(LENGTH(text) AS INT) AS len,
             UPPER(substr(text, 1, 12)) AS head_u,
             REVERSE(LOWER(substr(text, 1, 8))) AS tail_r,
             CAST(levenshtein(substr(text, 1, 16), 'training data is')
               AS INT) AS lev,
             string_split(text, ' ')[1] AS w1
      FROM documents ORDER BY doc_id"""))

  /** Higher-order array functions (transform / filter / aggregate) over
    * tokenized documents — per-row array algebra stays inside one
    * projection, no explode+reaggregate round trip. */
  val hof_tokens = GQuery(
    "hof_tokens",
    (s, d) => {
      import s.implicits._
      val toks = split($"text", " ")
      T.documents(s, d).select(
        $"doc_id",
        size(toks).as("n_tokens"),
        size(filter(toks, t => length(t) > 4)).as("n_long"),
        aggregate(toks, lit(0L), (acc, t) => acc + length(t))
          .as("chars_sum"),
        array_max(transform(toks, t => length(t))).as("max_len"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
             CAST(len(list_filter(string_split(text, ' '),
               t -> LENGTH(t) > 4)) AS INT) AS n_long,
             CAST(list_sum(list_transform(string_split(text, ' '),
               t -> LENGTH(t))) AS BIGINT) AS chars_sum,
             CAST(list_max(list_transform(string_split(text, ' '),
               t -> LENGTH(t))) AS INT) AS max_len
      FROM documents ORDER BY doc_id"""))

  /** Salted join equivalence: the hot-key-safe salted join (big side
    * salted by whole-row hash, small side replicated per bucket) must
    * produce exactly the plain inner join's result — the oracle IS the
    * plain join. */
  val skew_salted_join = GQuery(
    "skew_salted_join",
    (s, d) => {
      import s.implicits._
      val big = T.orders(s, d).select($"o_custkey".as("k"), $"o_totalprice")
      val small = T.customer(s, d)
        .select($"c_custkey".as("k"), $"c_mktsegment")
      graft.operators.Skew.saltedJoin(big, small, Seq("k"), saltBuckets = 8)
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"),
          dec(sum(dec($"o_totalprice", 4)), 4).cast("double").as("total"))
        .orderBy($"c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
               AS DECIMAL(38,4)) AS DOUBLE) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Correlated EXISTS subquery — Catalyst decorrelates it to a semi
    * join (pinned in PlanAuditSpec); the reference's driver-side loops
    * are the anti-pattern this replaces. */
  val sub_exists = GQuery(
    "sub_exists",
    (s, d) => {
      graft.Views.register(s, d)
      s.sql("""
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_totalprice > 400000)
        ORDER BY c_custkey""")
    },
    Some("""
      SELECT c_custkey, c_name
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_totalprice > 400000)
      ORDER BY c_custkey"""))

  /** Scalar + correlated-aggregate subqueries: orders beating the
    * global average while also being their customer's maximum. */
  val sub_scalar_corr = GQuery(
    "sub_scalar_corr",
    (s, d) => {
      graft.Views.register(s, d)
      s.sql("""
        SELECT o_orderkey,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice
        FROM orders o
        WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
          AND o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
        ORDER BY o_orderkey""")
    },
    Some("""
      SELECT o_orderkey,
             CAST(o_totalprice AS DOUBLE) AS o_totalprice
      FROM orders o
      WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
        AND o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
                            WHERE o2.o_custkey = o.o_custkey)
      ORDER BY o_orderkey"""))

  /** Calendar algebra: truncation, day-of-week (normalized to 0=Sunday
    * on both engines), month end, day diff to a fixed date. */
  val c8_calendar = GQuery(
    "c8_calendar",
    (s, d) => {
      import s.implicits._
      T.orders(s, d).select(
        $"o_orderkey",
        date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd")
          .as("month_start"),
        (dayofweek($"o_orderdate") - 1).as("dow"),
        date_format(last_day($"o_orderdate"), "yyyy-MM-dd")
          .as("month_end"),
        datediff(to_date(lit("1998-12-31")), to_date($"o_orderdate"))
          .as("days_to_end"))
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey,
             strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')
               AS month_start,
             CAST(dayofweek(o_orderdate) AS INT) AS dow,
             strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
               AS month_end,
             CAST(date_diff('day', CAST(o_orderdate AS DATE),
               DATE '1998-12-31') AS INT) AS days_to_end
      FROM orders ORDER BY o_orderkey"""))

  /** Deterministic collect: set-aggregation surfaced as a SORTED array
    * so the result is partitioning-independent (a bare collect_list is
    * not, and never appears in this engine's query surface). */
  val agg_collect = GQuery(
    "agg_collect",
    (s, d) => {
      import s.implicits._
      T.events(s, d)
        .filter($"user_id" < 50)
        .groupBy($"event_type")
        .agg(concat_ws(",",
          sort_array(collect_set($"user_id"))).as("users"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type,
             array_to_string(list_sort(list(DISTINCT user_id)), ',')
               AS users
      FROM events WHERE user_id < 50
      GROUP BY event_type ORDER BY event_type"""))

  /** RANGE window frame: value-bounded running sum (all ties included
    * by definition, so the frame is deterministic without a row-order
    * tiebreak). Both the aggregate AND the frame itself work in LONG
    * cents: a sliding range frame re-aggregates its window per row
    * (Spark's frame processors have no retract path), and `Decimal.+`
    * routes every add through BigDecimal — long cents keep the
    * O(n·frame) inner loop primitive (measured ~4× at sf0.1,
    * docs/PERF.md round 6). Cents are exact: prices are 2-decimal
    * doubles, so round(p·100) is the integer the file encodes, and
    * both engines divide the exact cent total by 100 in the same
    * double op. FRAME MEMBERSHIP is on cents too (ORDER BY cents
    * RANGE 10^6 PRECEDING — order-equivalent to price order): a
    * double frame bound `o_totalprice − 10000` is NOT exact — for
    * ~3% of cent values fl(fl(k/100)−10000) > fl((k−10^6)/100), so a
    * peer exactly $10000.00 below would be included by a cents frame
    * but excluded by a double frame (ADVICE r6, medium). Pinning
    * cents on both engines makes the frame data-independent and the
    * w4 ≡ w5 equivalence exact. */
  val w4_range_frame = GQuery(
    "w4_range_frame",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"cents").rangeBetween(-1000000L, 0L)
      T.orders(s, d)
        .withColumn("cents", round($"o_totalprice" * 100).cast("long"))
        .select(
          $"o_orderkey", $"o_orderpriority",
          (sum($"cents").over(w)
            .cast("double") / 100.0).as("nearby_total"))
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_orderpriority,
             CAST(SUM(cents) OVER
               (PARTITION BY o_orderpriority ORDER BY cents
                RANGE BETWEEN 1000000 PRECEDING AND CURRENT ROW)
               AS DOUBLE) / 100.0 AS nearby_total
      FROM (SELECT o_orderkey, o_orderpriority,
              CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders) ORDER BY o_orderkey"""))

  /** The SCALE path for the same range-frame semantics. w4 above uses
    * Spark's sliding RANGE frame, whose processor re-aggregates the
    * whole frame per row — O(rows × frame width), and frame width
    * grows with per-key history. This query computes the identical
    * result through [[graft.operators.RangeSum.slidingRangeSum]]
    * (cumulative-sum difference over a union of data rows and query
    * points — one incrementally-processed growing frame, O(rows log
    * rows) independent of frame width; boundary arithmetic documented
    * and property-tested there). Oracle: the very same cents-framed
    * RANGE SQL as w4 — DuckDB computes the frame natively, pinning the
    * reformulation bit-for-bit (exact long cents in the frame bound
    * AND the sum, so frame membership cannot wobble on double
    * rounding — ADVICE r6). */
  val w5_range_prefix = GQuery(
    "w5_range_prefix",
    (s, d) => {
      import s.implicits._
      val o = T.orders(s, d).select(
        $"o_orderkey", $"o_orderpriority",
        round($"o_totalprice" * 100).cast("long").as("cents"))
      graft.operators.RangeSum.slidingRangeSum(o, "o_orderpriority",
          Seq("o_orderkey"), "cents", width = 1000000L, "cents_sum")
        .select($"o_orderkey", $"o_orderpriority",
          ($"cents_sum".cast("double") / 100.0).as("nearby_total"))
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_orderpriority,
             CAST(SUM(cents) OVER
               (PARTITION BY o_orderpriority ORDER BY cents
                RANGE BETWEEN 1000000 PRECEDING AND CURRENT ROW)
               AS DOUBLE) / 100.0 AS nearby_total
      FROM (SELECT o_orderkey, o_orderpriority,
              CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders) ORDER BY o_orderkey"""))

  /** AVG over the same value-bounded sliding frame, through the
    * prefix-difference kernel's sum+count pass
    * ([[graft.operators.RangeSum.slidingRangeSumCount]]) — the
    * decomposable-aggregate side of the RangeSum boundary (MIN/MAX
    * have no subtraction law and take the block decomposition
    * instead; see w7_range_minmax). The division discipline is explicit on
    * both engines — exact long cent-sum cast to double, divided by
    * the exact long count, then by 100.0, in that order — rather
    * than a native AVG whose internal accumulation order differs. */
  val w6_range_avg = GQuery(
    "w6_range_avg",
    (s, d) => {
      import s.implicits._
      val o = T.orders(s, d).select(
        $"o_orderkey", $"o_orderpriority",
        round($"o_totalprice" * 100).cast("long").as("cents"))
      graft.operators.RangeSum.slidingRangeSumCount(o,
          "o_orderpriority", Seq("o_orderkey"), "cents",
          width = 1000000L, "cents_sum", "cents_cnt")
        .select($"o_orderkey", $"o_orderpriority",
          $"cents_cnt".as("nearby_n"),
          ($"cents_sum".cast("double") / $"cents_cnt" / 100.0)
            .as("nearby_avg"))
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_orderpriority,
             COUNT(cents) OVER w AS nearby_n,
             CAST(SUM(cents) OVER w AS DOUBLE)
               / COUNT(cents) OVER w / 100.0 AS nearby_avg
      FROM (SELECT o_orderkey, o_orderpriority,
              CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders)
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY cents
                   RANGE BETWEEN 1000000 PRECEDING AND CURRENT ROW)
      ORDER BY o_orderkey"""))

  /** MIN/MAX over the same value-bounded sliding frame — the
    * NON-decomposable side of the RangeSum boundary, through the
    * block-decomposition kernel
    * ([[graft.operators.RangeSum.slidingRangeMinMax]]): the frame
    * spans exactly two width-sized value blocks, each half a growing
    * running extreme Spark processes incrementally — O(n log n)
    * independent of frame width, where the native RANGE frame
    * re-scans the frame per row. Oracle: DuckDB computes the frame
    * natively, pinning the reformulation bit-for-bit on the same
    * exact-cents framing as w4/w5/w6. */
  val w7_range_minmax = GQuery(
    "w7_range_minmax",
    (s, d) => {
      import s.implicits._
      val o = T.orders(s, d).select(
        $"o_orderkey", $"o_orderpriority",
        round($"o_totalprice" * 100).cast("long").as("cents"))
      graft.operators.RangeSum.slidingRangeMinMax(o,
          "o_orderpriority", Seq("o_orderkey"), "cents",
          width = 1000000L, "cents_min", "cents_max")
        .select($"o_orderkey", $"o_orderpriority",
          ($"cents_min".cast("double") / 100.0).as("nearby_min"),
          ($"cents_max".cast("double") / 100.0).as("nearby_max"))
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_orderpriority,
             CAST(MIN(cents) OVER w AS DOUBLE) / 100.0 AS nearby_min,
             CAST(MAX(cents) OVER w AS DOUBLE) / 100.0 AS nearby_max
      FROM (SELECT o_orderkey, o_orderpriority,
              CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders)
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY cents
                   RANGE BETWEEN 1000000 PRECEDING AND CURRENT ROW)
      ORDER BY o_orderkey"""))

  /** Three-valued logic: null-excluding COUNT/DISTINCT/MAX, and
    * null-safe equality (`<=>` ≡ IS NOT DISTINCT FROM) — the semantics
    * that silently diverge between engines if unpinned. */
  val null_semantics = GQuery(
    "null_semantics",
    (s, d) => {
      import s.implicits._
      T.orders(s, d)
        .withColumn("st", nullif($"o_orderstatus", lit("F")))
        .groupBy($"o_orderpriority")
        .agg(
          count(lit(1)).as("n_rows"),
          count($"st").as("n_nonnull"),
          countDistinct($"st").as("n_distinct"),
          sum(($"st" <=> lit(null)).cast("long")).as("n_nullsafe_eq"),
          max($"st").as("max_st"))
        .orderBy($"o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(st) AS BIGINT) AS n_nonnull,
             CAST(COUNT(DISTINCT st) AS BIGINT) AS n_distinct,
             CAST(SUM(CASE WHEN st IS NOT DISTINCT FROM NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq,
             MAX(st) AS max_st
      FROM (SELECT o_orderpriority, nullif(o_orderstatus, 'F') AS st
            FROM orders)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Stratified sampling (df.stat.sampleBy, fixed seed) with a
    * statistical contract oracle: per-stratum sampled counts must land
    * within 4σ of fraction·N (binomial). Deterministic for a fixed
    * seed, so the boolean hash-checks. */
  val sample_stratified = GQuery(
    "sample_stratified",
    (s, d) => {
      import s.implicits._
      val f = 0.2
      // strata derived from the data, not hardcoded: an event_type
      // outside a literal map would be sampled at 0 and silently fail
      // the tolerance check on data-domain drift. Bounded collect: the
      // event-type domain is a handful of values by construction — and
      // the collected rows also REBUILD the totals side locally, so the
      // events aggregation executes once, not again inside the join.
      val totalRows = T.events(s, d).groupBy($"event_type")
        .agg(count(lit(1)).as("n_total")).collect()
        .map(r => r.getString(0) -> r.getLong(1))
      val strata = totalRows.map { case (t, _) => t -> f }.toMap
      val totals = totalRows.toSeq.toDF("event_type", "n_total")
      val sampled = T.events(s, d)
        .stat.sampleBy("event_type", strata, 42L)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_sampled"))
      totals.join(sampled, Seq("event_type"), "left")
        .select($"event_type", $"n_total",
          (abs(coalesce($"n_sampled", lit(0L)) - $"n_total" * f) <=
            lit(4.0) * sqrt(lit(f * (1 - f)) * $"n_total"))
            .as("within_tolerance"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_total,
             TRUE AS within_tolerance
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Table profiling: per-column null count, EXACT distinct count, and
    * min/max — the report a pipeline runs before trusting a new drop of
    * data (schema sanity, key uniqueness, value ranges). Two scans of
    * lineitem (the fixed-width stats in one wide `agg`, the string
    * min/max in a second — see the buffer note below), then the 1-row
    * result explodes into a row-per-column report. No string
    * formatting of numerics crosses the gate (numeric min/max stay
    * DOUBLE, timestamps go through exact epoch micros), so the hash
    * can never wobble on engine float-printing. `l_tax_pos` is a
    * derived nullable column so the null-counting path is exercised on
    * a corpus that ships no physical NULLs.
    *
    * Scale: the exact multi-column COUNT(DISTINCT) plans as ONE
    * Expand (×7) + single shuffle — the honest exact baseline. At
    * 100 TB the same report swaps `countDistinct` for
    * `approx_count_distinct` (no Expand, one projection; the sketch
    * path is separately gated by agg_approx_distinct). */
  val profile_columns = GQuery(
    "profile_columns",
    (s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d)
        .withColumn("l_tax_pos", when($"l_tax" > 0, $"l_tax"))
      val num = Seq(
        "l_orderkey" -> $"l_orderkey".cast("double"),
        "l_quantity" -> $"l_quantity",
        "l_extendedprice" -> $"l_extendedprice",
        "l_tax_pos" -> $"l_tax_pos",
        "l_shipdate" ->
          unix_micros($"l_shipdate".cast("timestamp")).cast("double"))
      val str = Seq(
        "l_returnflag" -> $"l_returnflag",
        "l_linestatus" -> $"l_linestatus")
      // string MIN/MAX live in their own 1-row aggregate: a string
      // aggregation BUFFER is not hash-aggregable, and one such
      // column demotes the whole distinct-Expand aggregate to
      // SortAggregate — measured 10.8 s vs 0.9 s warm at sf0.1. The
      // split keeps the big Expand agg fixed-width (HashAggregate)
      // and the string agg is a keyless partial min/max per
      // partition (no sort, no Expand). String KEYS (the distinct
      // counts) hash fine; only buffers demote.
      val aggs = count(lit(1)).as("n_rows") +:
        ((num ++ str).flatMap { case (n, c) => Seq(
          count(when(c.isNull, lit(1))).as(s"nn_$n"),
          count_distinct(c).as(s"nd_$n")) } ++
        num.flatMap { case (n, c) =>
          Seq(min(c).as(s"mn_$n"), max(c).as(s"mx_$n")) })
      val strAggs = str.flatMap { case (n, c) =>
        Seq(min(c).as(s"mns_$n"), max(c).as(s"mxs_$n")) }
      val nullStr = lit(null).cast("string")
      val nullNum = lit(null).cast("double")
      val rows =
        num.map { case (n, _) => struct(lit(n).as("col_name"),
          col(s"nn_$n").as("n_nulls"), col(s"nd_$n").as("n_distinct"),
          col(s"mn_$n").as("min_num"), col(s"mx_$n").as("max_num"),
          nullStr.as("min_str"), nullStr.as("max_str")) } ++
        str.map { case (n, _) => struct(lit(n).as("col_name"),
          col(s"nn_$n").as("n_nulls"), col(s"nd_$n").as("n_distinct"),
          nullNum.as("min_num"), nullNum.as("max_num"),
          col(s"mns_$n").as("min_str"), col(s"mxs_$n").as("max_str")) }
      li.agg(aggs.head, aggs.tail: _*)
        .crossJoin(broadcast(li.agg(strAggs.head, strAggs.tail: _*)))
        .select($"n_rows", explode(array(rows: _*)).as("c"))
        .select($"c.col_name", $"n_rows", $"c.n_nulls", $"c.n_distinct",
          $"c.min_num", $"c.max_num", $"c.min_str", $"c.max_str")
        .orderBy($"col_name")
    },
    Some("""
      WITH li AS (
        SELECT *, CASE WHEN l_tax > 0 THEN l_tax END AS l_tax_pos
        FROM lineitem)
      SELECT 'l_orderkey' AS col_name, COUNT(*) AS n_rows,
             COUNT(*) - COUNT(l_orderkey) AS n_nulls,
             COUNT(DISTINCT l_orderkey) AS n_distinct,
             CAST(MIN(l_orderkey) AS DOUBLE) AS min_num,
             CAST(MAX(l_orderkey) AS DOUBLE) AS max_num,
             CAST(NULL AS VARCHAR) AS min_str,
             CAST(NULL AS VARCHAR) AS max_str
      FROM li
      UNION ALL
      SELECT 'l_quantity', COUNT(*), COUNT(*) - COUNT(l_quantity),
             COUNT(DISTINCT l_quantity),
             MIN(l_quantity), MAX(l_quantity), NULL, NULL FROM li
      UNION ALL
      SELECT 'l_extendedprice', COUNT(*),
             COUNT(*) - COUNT(l_extendedprice),
             COUNT(DISTINCT l_extendedprice),
             MIN(l_extendedprice), MAX(l_extendedprice), NULL, NULL
      FROM li
      UNION ALL
      SELECT 'l_tax_pos', COUNT(*), COUNT(*) - COUNT(l_tax_pos),
             COUNT(DISTINCT l_tax_pos),
             MIN(l_tax_pos), MAX(l_tax_pos), NULL, NULL FROM li
      UNION ALL
      SELECT 'l_shipdate', COUNT(*), COUNT(*) - COUNT(l_shipdate),
             COUNT(DISTINCT l_shipdate),
             CAST(MIN(epoch_us(l_shipdate)) AS DOUBLE),
             CAST(MAX(epoch_us(l_shipdate)) AS DOUBLE), NULL, NULL
      FROM li
      UNION ALL
      SELECT 'l_returnflag', COUNT(*), COUNT(*) - COUNT(l_returnflag),
             COUNT(DISTINCT l_returnflag), NULL, NULL,
             MIN(l_returnflag), MAX(l_returnflag) FROM li
      UNION ALL
      SELECT 'l_linestatus', COUNT(*), COUNT(*) - COUNT(l_linestatus),
             COUNT(DISTINCT l_linestatus), NULL, NULL,
             MIN(l_linestatus), MAX(l_linestatus) FROM li
      ORDER BY col_name"""))

  /** The SCALE path for [[profile_columns]]' NDV report, gated: HLL++
    * `approx_count_distinct` (rsd 0.02) per column — a single
    * fixed-size sketch per column, NO Expand, partial-merge always
    * reduces (the exact report's partial stage stops reducing once key
    * NDV grows with the data — 11.6× at the sf1→sf10 decade,
    * docs/PERF.md). The contract recomputes the exact NDV in the same
    * query and gates |approx−exact|/exact ≤ 5%; the oracle rebuilds
    * exact NDV relationally and emits the booleans — so the sketch's
    * accuracy is hash-gated, not assumed, while its VALUE (engine-
    * specific) never crosses the gate. */
  val profile_ndv_approx = GQuery(
    "profile_ndv_approx",
    (s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d)
        .withColumn("l_tax_pos", when($"l_tax" > 0, $"l_tax"))
      val cols = Seq(
        "l_orderkey" -> $"l_orderkey",
        "l_quantity" -> $"l_quantity",
        "l_extendedprice" -> $"l_extendedprice",
        "l_tax_pos" -> $"l_tax_pos",
        "l_returnflag" -> $"l_returnflag")
      // the sketches live in their OWN aggregate: mixed with the
      // count_distincts, the distinct-rewrite Expand's first stage
      // evaluates every HLL buffer per (gid, value) GROUP — ~1.2 M
      // groups × 5 × 4 KB buffers, measured 55 s vs 4.4 s at sf0.1.
      // Split, the exact side is the same Expand profile_columns
      // pays and the sketch side is one scan with 5 buffers total
      // per partition.
      val exactAggs = cols.map { case (n, c) =>
        count_distinct(c).as(s"nd_$n") }
      val apxAggs = cols.map { case (n, c) =>
        approx_count_distinct(c, 0.02).as(s"na_$n") }
      val rows = cols.map { case (n, _) => struct(
        lit(n).as("col_name"),
        col(s"nd_$n").as("n_distinct"),
        (abs(col(s"na_$n") - col(s"nd_$n")).cast("double") /
          col(s"nd_$n").cast("double") <= 0.05).as("approx_ok")) }
      li.agg(exactAggs.head, exactAggs.tail: _*)
        .crossJoin(broadcast(li.agg(apxAggs.head, apxAggs.tail: _*)))
        .select(explode(array(rows: _*)).as("c"))
        .select($"c.col_name", $"c.n_distinct", $"c.approx_ok")
        .orderBy($"col_name")
    },
    Some("""
      WITH li AS (
        SELECT *, CASE WHEN l_tax > 0 THEN l_tax END AS l_tax_pos
        FROM lineitem)
      SELECT 'l_orderkey' AS col_name,
             COUNT(DISTINCT l_orderkey) AS n_distinct, TRUE AS approx_ok
      FROM li
      UNION ALL
      SELECT 'l_quantity', COUNT(DISTINCT l_quantity), TRUE FROM li
      UNION ALL
      SELECT 'l_extendedprice', COUNT(DISTINCT l_extendedprice), TRUE
      FROM li
      UNION ALL
      SELECT 'l_tax_pos', COUNT(DISTINCT l_tax_pos), TRUE FROM li
      UNION ALL
      SELECT 'l_returnflag', COUNT(DISTINCT l_returnflag), TRUE FROM li
      ORDER BY col_name"""))

  /** The Observation API (`df.observe` → CollectMetrics), gated: data-
    * quality counters piggyback on a pass that is doing OTHER work —
    * here a selective filter whose survivors are the pass's real
    * output — and the observed metrics see every pre-filter row
    * without a second scan or a separate aggregation job. At 100 TB
    * this is how a pipeline watches its own health (rows in, nulls,
    * checksums) for free; the gate proves the observed values are the
    * exact relational aggregates by rebuilding them in the oracle.
    * The observation is harvested driver-side after one forced
    * execution and returned as a literal row (ScanAudit pattern), so
    * the harness's re-executions never touch the one-shot
    * `Observation.get`. */
  val observed_metrics = GQuery(
    "observed_metrics",
    (s, d) => {
      import s.implicits._
      val obs = org.apache.spark.sql.Observation()
      val pass = T.lineitem(s, d)
        .observe(obs,
          count(lit(1)).as("n_rows"),
          sum(round($"l_extendedprice" * 100).cast("long"))
            .as("sum_cents"),
          max($"l_quantity").as("max_qty"))
        .filter($"l_quantity" > 45)
        .select($"l_orderkey", $"l_quantity")
      // a DATASET action, deliberately not Registry.force: the
      // observation completes via the SQLExecution listener, which
      // `queryExecution.toRdd` bypasses — obs.get would block forever
      // (CollectMetrics is a pruning barrier, so count() still
      // evaluates the observed expressions over every row)
      val survivors = pass.count()
      val m = obs.get
      s.range(1).select(
        lit(survivors).as("n_survivors"),
        lit(m("n_rows").asInstanceOf[Long]).as("n_rows"),
        lit(m("sum_cents").asInstanceOf[Long]).as("sum_cents"),
        lit(m("max_qty").asInstanceOf[Double]).as("max_qty"))
    },
    Some("""
      SELECT
        CAST(SUM(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_survivors,
        CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
          AS BIGINT) AS sum_cents,
        MAX(l_quantity) AS max_qty
      FROM lineitem"""))

  /** Equi-width histogram with data-derived bounds: 20 buckets of
    * l_extendedprice between the global min and max. All bucketing is
    * EXACT integer arithmetic on long cents — ((cents−min)·20) DIV
    * (max−min+1) — so bucket membership can never wobble on a double
    * boundary (the same discipline as the w4/w5 range frames). The
    * bounds are a 1-row aggregate broadcast back over the scan: at
    * 100 TB this is two scans (or one, with a pre-read stats pass from
    * the parquet footers) + a 20-group aggregation — no sort, no wide
    * shuffle. */
  val histogram_prices = GQuery(
    "histogram_prices",
    (s, d) => {
      import s.implicits._
      val cents = T.lineitem(s, d)
        .select(round($"l_extendedprice" * 100).cast("long").as("cents"))
      val bounds = cents.agg(min($"cents").as("min_c"),
        max($"cents").as("max_c"))
      cents.crossJoin(broadcast(bounds))
        .select(expr("(cents - min_c) * 20 DIV (max_c - min_c + 1)")
          .as("bucket"), $"cents")
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"),
          min($"cents").as("min_cents"), max($"cents").as("max_cents"),
          sum($"cents").as("sum_cents"))
        .orderBy($"bucket")
    },
    Some("""
      WITH c AS (
        SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem),
      s AS (SELECT MIN(cents) AS min_c, MAX(cents) AS max_c FROM c)
      SELECT (cents - min_c) * 20 // (max_c - min_c + 1) AS bucket,
             COUNT(*) AS n, MIN(cents) AS min_cents,
             MAX(cents) AS max_cents,
             CAST(SUM(cents) AS BIGINT) AS sum_cents
      FROM c, s GROUP BY 1 ORDER BY 1"""))

  /** Per-group top-k — the "3 biggest orders per priority class"
    * report, the single most common window use. The point of the gate
    * is the PLAN: Spark's InferWindowGroupLimit rewrites
    * `row_number ≤ k` into WindowGroupLimit whenever k is under
    * spark.sql.window.group.limit.threshold (default 1000), and it
    * plans TWO-PHASE — a Partial WindowGroupLimit keeps a k-heap
    * per map task BEFORE the group exchange, so at 100 TB the shuffle
    * carries ≤ k rows per (task × group), not the whole table (the
    * map-side-combine of windows). PlanAuditSpec pins both phases.
    * Total tie-break (o_totalprice DESC, o_orderkey) makes row_number
    * deterministic, so the rows hash-gate exactly. */
  val topk_per_group = GQuery(
    "topk_per_group",
    (s, d) => {
      import s.implicits._
      T.orders(s, d)
        .select($"o_orderpriority".as("grp"), $"o_orderkey",
          $"o_totalprice")
        .withColumn("rn", row_number().over(
          Window.partitionBy($"grp")
            .orderBy($"o_totalprice".desc, $"o_orderkey")))
        .filter($"rn" <= 3)
        .select($"grp", $"rn", $"o_orderkey", $"o_totalprice")
        .orderBy($"grp", $"rn")
    },
    Some("""
      SELECT grp, rn, o_orderkey, o_totalprice
      FROM (
        SELECT o_orderpriority AS grp, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        FROM orders)
      WHERE rn <= 3 ORDER BY grp, rn"""))

  /** Count-Min-sketch join-size estimation — the optimizer statistic
    * that prices an equi-join WITHOUT running it: |L ⋈ O on k| =
    * Σ_k c_L(k)·c_O(k), estimated by the inner product of the two
    * sides' Count-Min sketches (d=4 rows × w=1024 buckets, universal
    * hashes h_j(k) = ((a_j·k + b_j) mod (2³¹−1)) mod w with fixed
    * prime multipliers — pure integer algebra, identically spelled in
    * both engines; no md5, no floats). The CLASSIC GUARANTEE is the
    * gate: every per-row estimate over-counts (collisions only ADD
    * mass), so min_j est_j ≥ the true size ALWAYS — `overestimate_ok`
    * is a theorem, not a tolerance. The true size is recomputed
    * relationally on both engines (per-key count join — never the
    * row-level join itself), so the output hashes exactly: sketch
    * algebra AND bound.
    *
    * Scale shape: each sketch build is one groupBy(j, bucket) whose
    * map-side partial aggregation bounds the exchange at d·w rows per
    * task regardless of input size — the sketch, not the table, is
    * what shuffles; the inner product joins two ≤ d·w-row frames.
    * Products fit BIGINT through ~10⁹-row sides (c ≤ n per bucket ⇒
    * Σ products ≤ n²; the overflow fence for 100 TB is the house
    * DECIMAL(38,0) widening, drift_chi2's discipline). */
  val joinsize_cm_sketch = GQuery(
    "joinsize_cm_sketch",
    (s, d) => {
      import s.implicits._
      val P = 2147483647L
      val W = 1024L
      val as = Seq(1299709L, 15485863L, 32452843L, 49979687L)
      val bs = Seq(104729L, 224737L, 350377L, 479909L)
      def buckets(key: org.apache.spark.sql.Column) = explode(array(
        as.indices.map(j => struct(lit(j).as("j"),
          (((key * as(j) + bs(j)) % P) % W).as("bkt"))): _*))
      def sketch(df: org.apache.spark.sql.DataFrame,
          key: String, cnt: String) =
        df.select(buckets(col(key)).as("h"))
          .groupBy($"h.j".as("j"), $"h.bkt".as("bkt"))
          .agg(count(lit(1)).as(cnt))
      val sl = sketch(T.lineitem(s, d), "l_orderkey", "cl")
      val so = sketch(T.orders(s, d), "o_orderkey", "co")
      val est = sl.join(so, Seq("j", "bkt"))
        .groupBy($"j").agg(sum($"cl" * $"co").as("est_j"))
        .agg(min($"est_j").as("est"))
      val truth = T.lineitem(s, d).groupBy($"l_orderkey")
        .agg(count(lit(1)).as("cl"))
        .join(T.orders(s, d).groupBy($"o_orderkey")
            .agg(count(lit(1)).as("co")),
          $"l_orderkey" === $"o_orderkey")
        .agg(sum($"cl" * $"co").as("n_true"))
      truth.crossJoin(broadcast(est))
        .select($"n_true", $"est",
          ($"est" >= $"n_true").as("overestimate_ok"),
          // integer division on both engines: Spark's `/` is float
          // division and DuckDB ROUNDS on double→BIGINT casts where
          // Spark truncates — DIV / `//` sidesteps the divergence
          expr("CAST(((est - n_true) * 1000000) DIV n_true AS BIGINT)")
            .as("rel_err_micro"))
    },
    Some("""
      WITH hs(j, a, b) AS (VALUES
        (0, 1299709, 104729), (1, 15485863, 224737),
        (2, 32452843, 350377), (3, 49979687, 479909)),
      sl AS (
        SELECT j, ((l_orderkey * a + b) % 2147483647) % 1024 AS bkt,
               CAST(COUNT(*) AS BIGINT) AS cl
        FROM lineitem, hs GROUP BY 1, 2),
      so AS (
        SELECT j, ((o_orderkey * a + b) % 2147483647) % 1024 AS bkt,
               CAST(COUNT(*) AS BIGINT) AS co
        FROM orders, hs GROUP BY 1, 2),
      est AS (
        SELECT CAST(MIN(est_j) AS BIGINT) AS est FROM (
          SELECT j, SUM(cl * co) AS est_j
          FROM sl JOIN so USING (j, bkt) GROUP BY j)),
      t AS (
        SELECT CAST(SUM(cl * co) AS BIGINT) AS n_true FROM
          (SELECT l_orderkey AS k, COUNT(*) AS cl
           FROM lineitem GROUP BY 1) a
          JOIN
          (SELECT o_orderkey AS k, COUNT(*) AS co
           FROM orders GROUP BY 1) b USING (k))
      SELECT n_true, est, est >= n_true AS overestimate_ok,
             CAST((est - n_true) * 1000000 // n_true AS BIGINT)
               AS rel_err_micro
      FROM t, est"""))

  val all: Seq[GQuery] = Seq(null_semantics, sample_stratified,
    joinsize_cm_sketch,
    agg_rollup, agg_grouping_sets, topk_per_group,
    unpivot_measures, w3_distribution, agg_percentiles,
    agg_approx_percentile, str_funcs, hof_tokens, skew_salted_join,
    sub_exists, sub_scalar_corr, c8_calendar, agg_collect,
    w4_range_frame, w5_range_prefix, w6_range_avg, w7_range_minmax,
    profile_columns, profile_ndv_approx, histogram_prices,
    observed_metrics)
}
