package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** General-purpose streaming operators (engine improvements over the
  * reference, SURVEY §2.7: it has no watermarks, no event-time windows,
  * no late-data handling — ordering came from a single TCP socket).
  * Each works identically on `readStream` and `read` frames.
  */
object StreamOps {

  /** Event-time tumbling/sliding window aggregation with watermark;
    * late rows beyond the watermark are dropped (and counted by the
    * state store metrics). */
  def windowedAgg(events: DataFrame, tsCol: String, watermark: String,
      windowDur: String, slide: Option[String] = None,
      groupCols: Seq[String] = Nil, aggs: Seq[Column] = Seq(count(lit(1)).as("n")))
      : DataFrame = {
    val win = slide match {
      case Some(s) => window(col(tsCol), windowDur, s)
      case None => window(col(tsCol), windowDur)
    }
    events.withWatermark(tsCol, watermark)
      .groupBy(win +: groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Session windows keyed by `keyCols` with an inactivity gap —
    * the streaming analogue of the reference's match-punctuation state
    * (a match is a session of events per player). */
  def sessionAgg(events: DataFrame, tsCol: String, watermark: String,
      gap: String, keyCols: Seq[String],
      aggs: Seq[Column] = Seq(count(lit(1)).as("n"))): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap) +: keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Streaming exact dedup within the watermark horizon — state is
    * bounded by the horizon, so it runs forever at constant memory. */
  def dedupStream(events: DataFrame, tsCol: String, watermark: String,
      keyCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream equi-join with an event-time interval bound: right
    * rows match left rows with the same key whose timestamp falls in
    * [leftTs, leftTs + bound]. Both sides carry watermarks, so buffered
    * state is evicted once the bound + watermark horizon passes —
    * without the time bound a stream-stream join's state grows without
    * limit. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      watermark: String, bound: String): DataFrame = {
    // Both streams may name their event-time column identically: the
    // right side's is renamed BEFORE the watermark (so the watermark
    // follows the renamed column) and the output stays unambiguous.
    // The synthesized name is suffixed until it is fresh on BOTH
    // schemas — a pre-existing right_<ts> column would otherwise make
    // the watermark/join condition ambiguous.
    val (rRenamed, rTs) =
      if (left.columns.contains(rightTs)) {
        val fresh = Iterator.iterate(s"right_$rightTs")(_ + "_")
          .dropWhile(n => left.columns.contains(n) ||
            right.columns.contains(n))
          .next()
        (right.withColumnRenamed(rightTs, fresh), fresh)
      } else (right, rightTs)
    val l = left.withWatermark(leftTs, watermark)
    val r = rRenamed.withWatermark(rTs, watermark)
    l.join(r, l(key) === r(key) &&
      r(rTs) >= l(leftTs) &&
      r(rTs) <= l(leftTs) + expr(s"INTERVAL $bound"),
      "inner")
      .drop(r(key))
  }

  /** Exact state-eviction evidence via [[StreamingQueryListener]] —
    * the ADVICE-r9 replacement for summing `recentProgress`, whose
    * ring buffer (numRecentProgressUpdates, default 100) silently
    * truncates long replays and whose length==retention tripwire had
    * an unavoidable false-positive class. The listener sees EVERY
    * progress event (per-query totals keyed by query run id, no
    * retention), and [[EvictionEvidence.await]] blocks on the
    * terminated event — the listener bus is FIFO per query, so once
    * the termination event lands every progress event has too.
    * Usage: `val ev = EvictionEvidence.install(spark)` before
    * `start()`, then after `awaitTermination()`:
    * `val (removed, peak) = ev.await(q.id)` (and the listener is
    * removed). */
  final class EvictionEvidence private[streaming] (
      spark: org.apache.spark.sql.SparkSession) {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    private val removedById =
      new java.util.concurrent.ConcurrentHashMap[java.util.UUID, java.lang.Long]
    private val peakById =
      new java.util.concurrent.ConcurrentHashMap[java.util.UUID, java.lang.Long]
    private val doneById =
      new java.util.concurrent.ConcurrentHashMap[java.util.UUID,
        java.util.concurrent.CountDownLatch]
    private def latch(id: java.util.UUID) =
      doneById.computeIfAbsent(id,
        _ => new java.util.concurrent.CountDownLatch(1))
    private val listener = new StreamingQueryListener {
      import StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val ops = e.progress.stateOperators
        removedById.merge(e.progress.id,
          ops.map(_.numRowsRemoved).sum, (a, b) => a + b)
        peakById.merge(e.progress.id,
          ops.map(_.numRowsTotal).foldLeft(0L)(math.max),
          (a, b) => math.max(a, b))
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        latch(e.id).countDown()
    }
    spark.streams.addListener(listener)

    /** (Σ numRowsRemoved, peak numRowsTotal) for query `id`, after
      * waiting (≤60 s) for its terminated event; deregisters the
      * listener. */
    def await(id: java.util.UUID): (Long, Long) =
      try {
        require(latch(id).await(60,
            java.util.concurrent.TimeUnit.SECONDS),
          s"no QueryTerminated event for $id within 60s - listener " +
            "bus stalled; eviction evidence would be incomplete")
        (Option(removedById.get(id)).fold(0L)(_.longValue),
          Option(peakById.get(id)).fold(0L)(_.longValue))
      } finally close()

    /** Idempotent deregistration (ADVICE-r10): if the query's
      * start()/awaitTermination() throws BEFORE await() is reached,
      * the listener would otherwise leak on the shared SparkSession
      * for the rest of the process. Call sites wrap the query run in
      * try/finally over this; a double remove (finally + await's own)
      * is a no-op because the CopyOnWriteArrayList remove of an
      * already-removed listener does nothing. */
    def close(): Unit =
      if (closed.compareAndSet(false, true))
        spark.streams.removeListener(listener)
    private val closed =
      new java.util.concurrent.atomic.AtomicBoolean(false)
  }
  object EvictionEvidence {
    def install(spark: org.apache.spark.sql.SparkSession)
        : EvictionEvidence = new EvictionEvidence(spark)
  }

  /** One LWW CDC record — the state AND emission type of
    * [[cdcApplyStream]]. */
  case class CdcRec(k: Long, seq: Long, op: String, cents: Long,
      pri: String)

  /** Streaming CDC apply — per-key last-writer-wins as an explicit
    * flatMapGroupsWithState machine. State is ONE record per key (the
    * current winner by `seq`), so the state store is key-cardinality-
    * bounded regardless of log length; arrival order is irrelevant
    * because max-by-seq is commutative and associative (a late
    * replayed batch can never regress a key). Each batch a key
    * appears in emits that key's UPDATED winner — an append-mode
    * state-update change log, the shape a downstream consumer
    * log-compacts (and [[graft.queries.Pipeline.cdcCollapse]] is
    * exactly that compaction, so the batch and streaming paths share
    * one kernel and one oracle). */
  def cdcApplyStream(log: DataFrame): DataFrame = {
    import log.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
      OutputMode}
    def handle(k: Long, it: Iterator[CdcRec],
        state: GroupState[CdcRec]): Iterator[CdcRec] = {
      val best = it.foldLeft(state.getOption.orNull) { (b, r) =>
        if (b == null || r.seq > b.seq) r else b
      }
      if (best == null) Iterator.empty
      else { state.update(best); Iterator.single(best) }
    }
    log.as[CdcRec].groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(handle)
      .toDF()
  }

  /** One term-dictionary update — the emission type of
    * [[indexDictStream]]: the RUNNING (df, total_tf) after the batch. */
  case class DictRec(term: String, df: Long, total_tf: Long)

  /** Streaming term-dictionary maintenance — the index lifecycle's
    * streaming leg (batch legs: IndexOps build, index_ivm_merge):
    * per-term (df, total_tf) accumulated across micro-batches by an
    * explicit flatMapGroupsWithState machine. State is ONE (df, tf)
    * pair per term, so the state store is VOCABULARY-bounded — the
    * right 100 TB shape, since vocabulary grows sublinearly in the
    * corpus while the token stream is corpus-sized and passes through
    * statelessly.
    *
    * PRECONDITION (df additivity — the index_ivm_merge segment
    * invariant in streaming form): every document's token rows must
    * arrive in ONE micro-batch. The gate's replay guarantees it by
    * slicing on a function of doc_id; a doc split across batches
    * would double-count df (proven load-bearing by the negative test
    * in StreamGateSpec). total_tf needs no such care — occurrence
    * counting is additive under any batching.
    *
    * Each batch a term appears in emits the UPDATED running totals —
    * an append-mode change log whose compaction is `max` per term
    * (both counters are monotone), the cdcApplyStream discipline with
    * an even simpler compactor.
    *
    * The token stream is pre-aggregated to (term, doc_id, tf) rows
    * BEFORE the state operator (VERDICT-r11 item 4): the raw stream
    * repartitions on (term, doc_id) — a stateless batch-local
    * exchange, so each pair lands whole in one task of the CURRENT
    * micro-batch — and a per-partition hash combine collapses it to
    * one row per pair. The handler then just counts rows streaming
    * through its iterator (df += 1, tf += count) in O(1) memory per
    * key. Without this, the handler built a per-(term, batch) HashSet
    * of doc ids — batch-df-sized executor memory pinned on a single
    * stopword key; now a stopword term costs one counter, and the
    * memory lives in the combine's partition-spread hash maps (each
    * holding only its partition's share of the batch's distinct
    * pairs — the map-side-combine shape). The (term, doc_id) hash
    * spread is also why a stopword cannot pin the combine itself:
    * doc_id scatters its rows across every partition. */
  def indexDictStream(tokens: DataFrame): DataFrame = {
    import tokens.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
      OutputMode}
    def handle(term: String, it: Iterator[(String, Long, Long)],
        state: GroupState[(Long, Long)]): Iterator[DictRec] = {
      var df = 0L
      var occ = 0L
      it.foreach { r => df += 1; occ += r._3 }
      if (df == 0L) Iterator.empty
      else {
        val (df0, tf0) = state.getOption.getOrElse((0L, 0L))
        val next = (df0 + df, tf0 + occ)
        state.update(next)
        Iterator.single(DictRec(term, next._1, next._2))
      }
    }
    tokens.select(col("doc_id"), col("term")).as[(Long, String)]
      .repartition(col("doc_id"), col("term"))
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[(Long, String), Long]
        it.foreach { r =>
          m.updateWith(r)(c => Some(c.getOrElse(0L) + 1L))
        }
        m.iterator.map { case ((doc, term), tf) => (term, doc, tf) }
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(handle)
      .toDF()
  }

  case class CellRec(cell: Int, n: Long, norm_sum: Double)

  /** Streaming ANN cell-occupancy maintenance — the persisted vector
    * index's streaming leg (batch legs: AnnIndex build/probe,
    * ann_ivm_merge), completing the build/probe/merge/stream symmetry
    * the text index already has. Arriving vectors are assigned to
    * their coarse cell STATELESSLY per micro-batch — one map-side
    * argmax projection against the broadcast centroid literals loaded
    * from the warm index at open() ([[graft.operators.AnnIndex
    * .assignCell]]) — and a flatMapGroupsWithState machine accumulates
    * per-cell (count, Σ‖v‖): the occupancy statistics a production
    * IVF server maintains online to decide when cell skew warrants
    * re-training the quantizer. State is ONE counter pair per cell —
    * bounded by nlist (16), the tightest state bound in the gate
    * suite — while the vector stream is corpus-sized and passes
    * through statelessly; the batch-local pre-aggregation collapses
    * each micro-batch to ≤ nlist rows before the state operator (the
    * indexDictStream discipline, with a GROUP key so small no
    * combine-spread subtlety remains). Per-batch running totals are
    * append-mode change-log rows; compaction is `max(n)` per cell
    * (monotone count carries its Σ‖v‖ beside it via the max-by
    * struct trick).
    *
    * Determinism note: `n` is exact under any partitioning and is
    * what the gate hashes; `norm_sum` is a double accumulation whose
    * low bits depend on arrival order — it is ADVISORY (the skew
    * signal a rebalancer thresholds, never compares exactly), so the
    * oracle gate never sees it and Round12Spec checks it against the
    * batch recompute to 1e-6 relative. */
  def annCellStream(vecs: DataFrame,
      cents: Seq[(Int, Array[Float], Double)]): DataFrame = {
    import vecs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
      OutputMode}
    def handle(cell: Int, it: Iterator[(Int, Long, Double)],
        state: GroupState[(Long, Double)]): Iterator[CellRec] = {
      var n = 0L
      var s = 0.0
      it.foreach { r => n += r._2; s += r._3 }
      if (n == 0L) Iterator.empty
      else {
        val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
        val next = (n0 + n, s0 + s)
        state.update(next)
        Iterator.single(CellRec(cell, next._1, next._2))
      }
    }
    vecs.select(
        graft.operators.AnnIndex.assignCell(col("embedding"), cents)
          .as("cell"),
        graft.functions.VectorExprs.fnorm(col("embedding")).as("nrm"))
      .as[(Int, Double)]
      // batch-local pre-agg: a STATELESS per-partition combine (a
      // streaming groupBy here would be a second stateful operator —
      // illegal before FMGWS), emitting <= nlist rows per partition;
      // count and Σ‖v‖ are additive under any partitioning, so no
      // repartition is owed (unlike indexDictStream's df counting)
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[Int, (Long, Double)]
        it.foreach { case (c, nrm) =>
          val (n0, s0) = m.getOrElse(c, (0L, 0.0))
          m.update(c, (n0 + 1L, s0 + nrm))
        }
        m.iterator.map { case (c, (n, s)) => (c, n, s) }
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(handle)
      .toDF()
  }
}
