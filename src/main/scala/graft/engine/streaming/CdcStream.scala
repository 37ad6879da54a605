package graft.engine.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming CDC upsert view on `transformWithState` — the incremental
  * face of [[graft.engine.ext.Changelog]]: the same latest-wins-by-LSN
  * fold that `ext_cdc_merge` states as a batch MERGE, held as per-key
  * state so every micro-batch emits the keys it changed (a continuously
  * maintained snapshot table, Update output mode).
  *
  * The fold is a per-key MAX over the (ts_us, event_id) LSN plus an op
  * counter — commutative and idempotent-per-LSN, so snapshots converge
  * to the batch answer regardless of micro-batch boundaries or
  * within-batch order (same convergence class as the conversion-lag
  * processor, stronger than ordered-ingestion operators). The batch twin
  * in the oracle registry is the equality proof; CdcStreamSpec replays
  * the same changelog under different batchings and checks the final
  * state matches [[graft.engine.ext.Changelog.state]].
  *
  * Tombstones ride the state as `op = "D"` rather than clearing it:
  * a reader filters `op = 'U'` exactly as the batch merge does, and —
  * while the tombstone state is RETAINED — a late out-of-order upsert
  * with a lower LSN cannot resurrect a deleted key. The optional TTL
  * mode weakens that guarantee: TTL expires ALL idle per-key state
  * (live 'U' rows included, whose next upsert then restarts n_ops), and
  * once a tombstone expires a late lower-LSN upsert re-creates the key.
  * So the no-resurrection guarantee holds iff TTL ≥ the maximum
  * expected lateness — the same bound a compaction policy puts on
  * dropping delete markers. The default (TTLConfig.NONE) retains state
  * forever and keeps the guarantee unconditional.
  */
object CdcStream {

  /** One changelog record: LSN = (ts_us, event_id), op ∈ {U, D}. */
  final case class CdcOp(user_id: Long, event_id: Long, ts_us: Long,
                         event_type: String, value_c: Long, op: String)

  /** Per-key state and emitted snapshot row (op carried so readers can
    * apply the tombstone filter).
    */
  final case class CdcState(op: String, event_type: String, value_c: Long,
                            ts_us: Long, event_id: Long, n_ops: Long)

  final case class CdcSnapshot(user_id: Long, op: String, event_type: String,
                               value_c: Long, last_ts_us: Long, n_ops: Long)

  class CdcProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, CdcOp, CdcSnapshot] {
    @transient private var state: ValueState[CdcState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[CdcState]("cdc",
        Encoders.product[CdcState], ttl)

    override def handleInputRows(uid: Long, rows: Iterator[CdcOp],
                                 tv: TimerValues): Iterator[CdcSnapshot] = {
      var cur =
        if (state.exists()) state.get()
        else CdcState("", "", 0L, Long.MinValue, Long.MinValue, 0L)
      rows.foreach { r =>
        // latest-wins: strictly higher (ts_us, event_id) replaces
        val newer = r.ts_us > cur.ts_us ||
          (r.ts_us == cur.ts_us && r.event_id > cur.event_id)
        cur =
          if (newer)
            CdcState(r.op, r.event_type, r.value_c, r.ts_us, r.event_id,
              cur.n_ops + 1)
          else cur.copy(n_ops = cur.n_ops + 1)
      }
      state.update(cur)
      Iterator.single(
        CdcSnapshot(uid, cur.op, cur.event_type, cur.value_c, cur.ts_us,
          cur.n_ops))
    }
  }

  /** The maintained snapshot stream: one Update-mode row per changed key
    * per micro-batch.
    */
  def snapshots(ops: Dataset[CdcOp],
                ttl: TTLConfig = TTLConfig.NONE): Dataset[CdcSnapshot] = {
    import ops.sparkSession.implicits._
    ops.groupByKey(_.user_id)
      .transformWithState(new CdcProcessor(ttl),
        TimeMode.None(), OutputMode.Update())
  }
}
