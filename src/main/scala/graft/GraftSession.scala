package graft

import org.apache.spark.sql.SparkSession

/** One-stop session factory — the library's recommended configuration
  * for both local development and cluster submission. A user switching
  * from the reference project calls `GraftSession.local()` (or applies
  * [[tuned]] to their own builder) and gets:
  *
  *  - AQE on (runtime broadcast selection, partition coalescing,
  *    skew-join splitting),
  *  - the graft SQL functions (`fdot`, `minhash_sig`, `shingle_set`)
  *    registered via SparkSessionExtensions,
  *  - the RocksDB state store for streaming state (required by
  *    transformWithState, and the right choice for large keyed state),
  *  - UTC session time — timestamp columns are TIMESTAMP_NTZ µs in the
  *    test data, and the UTC pin makes `cast("timestamp")` /
  *    `unix_micros` an exact instant reinterpretation.
  *
  * On a real cluster, master/shuffle-partitions come from spark-submit;
  * only [[tuned]] is applied. Shuffle-partition count is a per-job
  * decision at scale — AQE coalescing makes a high initial value safe.
  */
object GraftSession {

  /** Library tuning applied to any builder. */
  def tuned(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    // legacy flag kept for pre-r7-format data (TIMESTAMP(NANOS) parquet
    // → epoch-nano long); inert on the current µs-precision testdata
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // r14 note: RocksDB changelog checkpointing was tried here
    // (commit uploads the batch's change set; snapshots move to
    // background maintenance). Isolated it measured ~9% off a
    // streaming gate — but in a full serial bench pass the DEFERRED
    // snapshot work runs on maintenance threads that compete with
    // every subsequent query, smearing ~45 s across the 256-entry run
    // (q1_agg alone absorbed +11.7 s right after the streaming
    // warm-ups). The work is conserved, not saved; at streaming-gate
    // state sizes the commit-time snapshot is the cheaper total.
    // Reverted — see OPTIMIZATION_r14.md §streaming.

  /** Local session sized to `cores` (default: all), shuffle partitions
    * matched to cores — the local analogue of sizing partitions to the
    * executor fleet. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
      appName: String = "graft"): SparkSession = {
    val s = tuned(SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    // getOrCreate silently ignores static confs (spark.sql.extensions)
    // when a session already exists in the JVM — register the functions
    // at runtime too so the advertised SQL surface always holds
    graft.functions.GraftExtensions.register(s)
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Smoke check: the tuned session exposes the graft SQL functions and
    * the streaming/state configs (run as `runMain graft.GraftSession`). */
  def main(args: Array[String]): Unit = {
    val s = local(4, "graft-session-check")
    val dot = s.sql("SELECT fdot(array(1.0F, 2.0F), array(3.0F, 4.0F)) v")
      .head().getDouble(0)
    require(dot == 11.0, s"fdot via SQL returned $dot")
    require(s.conf.get("spark.sql.adaptive.enabled") == "true")
    require(s.conf.get("spark.sql.streaming.stateStore.providerClass")
      .contains("RocksDB"))
    println(s"""{"graft_session":"ok","fdot":$dot}""")
    s.stop()
  }
}
