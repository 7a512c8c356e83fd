package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.{GQuery, Tables => T}
import graft.streaming.StreamOps

/** Driver hash gates for the §2.7 watermark operators (round 6).
  *
  * Same trick as stream_fold (Core.scala): Spark executes every one of
  * these streaming operators on BATCH Datasets too — watermarks become
  * no-ops, `session_window`/`window` group exactly as they do under a
  * trigger, and `dropDuplicatesWithinWatermark` degrades to plain
  * key-dedup — so the REAL `StreamOps` functions (the ones StreamingSpec
  * drives through readStream with RocksDB state) can sit under the
  * DuckDB oracle instead of ScalaTest only. What batch execution cannot
  * exercise — late-row eviction, state-store bounds, recovery — stays
  * pinned in StreamingSpec/RecoverySpec; what it CAN exercise — the
  * window assignment, session merge boundary, interval-join bound
  * arithmetic, key-dedup semantics — is hash-checked here.
  *
  * Time: events.ts is epoch-nano LONG under nanosAsLong (Extras header
  * note); all operators need a real timestamp column, so each query
  * derives `ets = timestamp_micros(ts DIV 1000)` — integer floor
  * division, exactly DuckDB's epoch_us() truncation (a double-precision
  * `/ 1000` would wobble ±1 µs at 2023-epoch magnitudes).
  */
object Streaming {

  private def withEts(s: org.apache.spark.sql.SparkSession, d: String) =
    T.events(s, d).withColumn("ets", timestamp_micros(expr("ts DIV 1000")))

  private def decSum(c: Column): Column =
    sum(c.cast("decimal(38,2)")).cast("double")

  /** Event-time tumbling window aggregation through the real
    * `StreamOps.windowedAgg` (watermark + window() groupBy). The 1-hour
    * window is epoch-aligned on both engines, so the oracle rebuilds
    * the bucket with integer µs arithmetic. */
  val stream_window_agg = GQuery(
    "stream_window_agg",
    (s, d) => {
      import s.implicits._
      StreamOps.windowedAgg(withEts(s, d), "ets",
          watermark = "10 minutes", windowDur = "1 hour",
          groupCols = Seq("event_type"),
          aggs = Seq(count(lit(1)).as("n"),
            decSum($"value").as("total")))
        .select(
          unix_micros($"window.start").as("w_start_us"),
          unix_micros($"window.end").as("w_end_us"),
          $"event_type", $"n", $"total")
        .orderBy($"w_start_us", $"event_type")
    },
    Some("""
      SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS w_start_us,
             epoch_us(ts) - epoch_us(ts) % 3600000000 + 3600000000
               AS w_end_us,
             event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS total
      FROM events
      GROUP BY 1, 2, 3 ORDER BY w_start_us, event_type"""))

  /** Session windows through the real `StreamOps.sessionAgg`
    * (30-minute inactivity gap per user). Spark merges when the next
    * event's window start TOUCHES the previous session's end
    * (inclusive <=): an event exactly gap after its predecessor still
    * extends the session, gap+1µs splits — pinned in StreamGateSpec,
    * which caught the opposite (`>=`) encoding passing sf0.01 purely
    * because µs-resolution data never lands on the exact boundary.
    * Session end is last_ts + gap. The oracle's island detection
    * therefore flags `gap > 30min ⇒ new session` — same boundary the
    * batch `sessionize` (Extras) happens to use, but pinned here to
    * Spark's operator semantics rather than convention. Both oracle
    * windows (the LAG and the island numbering) order by
    * (epoch_us(ts), event_id) — the SAME floored-µs order: ordering
    * the LAG by raw-ns `ts` could disagree on same-µs ties and split
    * a session Spark merges. NB the SQL must stay comment-free: the
    * harness may collapse newlines, and a `--` would swallow the
    * rest of the query. */
  val stream_sessions = GQuery(
    "stream_sessions",
    (s, d) => {
      import s.implicits._
      StreamOps.sessionAgg(withEts(s, d), "ets",
          watermark = "10 minutes", gap = "30 minutes",
          keyCols = Seq("user_id"),
          aggs = Seq(count(lit(1)).as("n_events"),
            decSum($"value").as("total")))
        .select($"user_id",
          unix_micros($"session_window.start").as("s_start_us"),
          unix_micros($"session_window.end").as("s_end_us"),
          $"n_events", $"total")
        .orderBy($"user_id", $"s_start_us")
    },
    Some("""
      WITH g AS (
        SELECT user_id, event_id, value, epoch_us(ts) AS us,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER
                 (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                 AS gap
        FROM events),
      s AS (
        SELECT user_id, value, us,
               SUM(CASE WHEN gap IS NULL OR gap > 1800000000
                        THEN 1 ELSE 0 END) OVER
                 (PARTITION BY user_id ORDER BY us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS sid
        FROM g)
      SELECT user_id, MIN(us) AS s_start_us,
             MAX(us) + 1800000000 AS s_end_us,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS total
      FROM s GROUP BY user_id, sid ORDER BY user_id, s_start_us"""))

  /** Stream-stream interval join through the real
    * `StreamOps.intervalJoin`: errors within 10 minutes AFTER a signup
    * of the same user, both sides watermarked, the right event-time
    * column auto-renamed by the operator (both sides arrive named
    * `ets`, exercising the collision path). Inclusive bounds
    * [l.ts, l.ts + bound] on both engines. */
  val stream_interval_join = GQuery(
    "stream_interval_join",
    (s, d) => {
      import s.implicits._
      val e = withEts(s, d)
      val signups = e.filter($"event_type" === "signup")
        .select($"user_id", $"event_id".as("signup_id"), $"ets")
      val errors = e.filter($"event_type" === "error")
        .select($"user_id", $"event_id".as("error_id"), $"ets")
      StreamOps.intervalJoin(signups, errors, key = "user_id",
          leftTs = "ets", rightTs = "ets",
          watermark = "10 minutes", bound = "10 minutes")
        .select($"user_id", $"signup_id", $"error_id",
          unix_micros($"ets").as("signup_us"),
          unix_micros($"right_ets").as("error_us"))
        .orderBy($"signup_id", $"error_id")
    },
    Some("""
      WITH s AS (
        SELECT user_id, event_id AS signup_id, epoch_us(ts) AS signup_us
        FROM events WHERE event_type = 'signup'),
      e AS (
        SELECT user_id, event_id AS error_id, epoch_us(ts) AS error_us
        FROM events WHERE event_type = 'error')
      SELECT s.user_id, signup_id, error_id, signup_us, error_us
      FROM e JOIN s ON e.user_id = s.user_id
        AND e.error_us >= s.signup_us
        AND e.error_us <= s.signup_us + 600000000
      ORDER BY signup_id, error_id"""))

  /** Watermark-horizon exact dedup through the real
    * `StreamOps.dedupStream` — and unlike the three gates above this
    * one must run as an ACTUAL streaming query:
    * `dropDuplicatesWithinWatermark` is rejected on batch Datasets
    * (Spark 4.1 refuses the plan), so the query lands the keyed
    * projection as ONE parquet file, replays it through
    * readStream → dedup → parquet sink with AvailableNow, and returns
    * the materialized result (upsert_snapshot's collect-then-cleanup
    * pattern, so repeated harness executions leak nothing).
    *
    * Determinism: the input is pre-projected to exactly the dedup key
    * (plus the event-time column the operator requires), so every
    * survivor row is byte-identical regardless of which physical row
    * won; the single input file lands in a single micro-batch, where
    * the watermark is still at origin, so no row is late-dropped and
    * streaming dedup ≡ full distinct — which is what the oracle
    * rebuilds. Horizon EVICTION (late rows beyond the watermark, state
    * bounds across many batches) cannot be made deterministic under a
    * hash gate and stays pinned in StreamingSpec. */
  val stream_dedup = GQuery(
    "stream_dedup",
    (s, d) => graft.GQuery.withTempTable(s, "graft-stream-dedup") { t =>
      import s.implicits._
      import org.apache.spark.sql.streaming.Trigger
      val inDir = s"$t/in"
      withEts(s, d).select($"user_id", $"event_type", $"ets")
        .coalesce(1)
        .write.mode("overwrite").parquet(inDir)
      val outDir = s"$t/out"
      val q = StreamOps.dedupStream(
          s.readStream.schema(s.read.parquet(inDir).schema)
            .parquet(inDir),
          "ets", watermark = "10 minutes",
          keyCols = Seq("user_id", "event_type"))
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", s"$t/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(outDir)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_types"),
          concat_ws(",", sort_array(collect_list($"event_type")))
            .as("types"))
        .orderBy($"user_id")
    },
    Some("""
      SELECT user_id, COUNT(DISTINCT event_type) AS n_types,
             array_to_string(list_sort(list(DISTINCT event_type)), ',')
               AS types
      FROM events GROUP BY user_id ORDER BY user_id"""))

  val all: Seq[GQuery] = Seq(
    stream_window_agg, stream_sessions, stream_interval_join,
    stream_dedup)
}
