package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}
import FplStream.{MatchClose, PlayerMsg, PlayerState}

/** The per-player punctuated state pipeline on Spark 4's
  * `transformWithState` (arbitrary-state v2) API — the modern successor
  * to `flatMapGroupsWithState` SURVEY §2.5/§2.7 targets: named state
  * variables on the RocksDB store (required by the API), per-state TTL,
  * and processing/event-time timers when needed.
  *
  * The fold itself is [[FplStream.foldMessages]] — one kernel shared
  * with the flatMapGroupsWithState path, so batch ≡ FMGWS ≡ TWS is a
  * property of construction, pinned by StreamingSpec.
  */
object FplStreamTWS {

  class PlayerProcessor
      extends StatefulProcessor[Long, PlayerMsg, MatchClose] {
    @transient private var st: ValueState[PlayerState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[PlayerState]("playerState",
        Encoders.product[PlayerState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[PlayerMsg],
        timers: TimerValues): Iterator[MatchClose] = {
      val start = if (st.exists()) st.get() else FplStream.initialState
      val (next, out) = FplStream.foldMessages(key, start, rows)
      st.update(next)
      out.iterator
    }
  }

  /** Streaming messages → match-close stream via transformWithState.
    * Requires `spark.sql.streaming.stateStore.providerClass` =
    * RocksDBStateStoreProvider (the API's only supported store). */
  def matchCloses(msgs: Dataset[PlayerMsg]): Dataset[MatchClose] = {
    import msgs.sparkSession.implicits._
    msgs.groupByKey(_.playerId)
      .transformWithState(new PlayerProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
