package graft.engine.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}

/** Streaming event-pipeline operators: native session windows and a
  * custom-state aggregation — the Structured Streaming face of
  * [[graft.engine.ext.Sessionize]].
  *
  * Input contract: a streaming Dataset of [[EventStream.UserEvent]]
  * (user_id, event_time, value). At 100 TB/day both operators shuffle
  * once on user_id and keep per-key state bounded: session windows are
  * evicted by the watermark, and the custom state is O(1) per user.
  */
object EventStream {

  final case class UserEvent(user_id: Long, event_time: java.sql.Timestamp,
                             value: Double)

  final case class TypedEvent(user_id: Long, event_time: java.sql.Timestamp,
                              event_type: String)

  /** Funnel state: first qualifying time (µs) of each ordered step, or
    * MinValue when the step hasn't been reached yet.
    */
  final case class FunnelState(s1_us: Long, s2_us: Long, s3_us: Long)

  final case class FunnelSnapshot(user_id: Long, depth: Long,
                                  s1_us: Long, s2_us: Long, s3_us: Long)

  /** Per-user running profile (custom state kept across micro-batches). */
  final case class UserProfile(n_events: Long, sum_value_c: Long,
                               last_seen_us: Long)

  final case class UserSnapshot(user_id: Long, n_events: Long,
                                sum_value_c: Long, last_seen_us: Long)

  /** Sessionization with Spark's NATIVE session_window: gap-based windows
    * merged by the engine, state bounded by the watermark. This is the
    * streaming twin of the batch lag()-based sessionizer — same gap
    * semantics, incremental execution.
    */
  def sessionStats(events: DataFrame, gap: String = "30 minutes",
                   watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("event_time", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("event_time"), gap))
      .agg(
        count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100).cast("long")).as("sum_value_c"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value_c"))

  /** Streaming twin of [[graft.engine.ext.Sessionize.funnel]]: the
    * view → click → purchase state machine as O(1) per-user state,
    * advanced every micro-batch. Within a batch events are applied in
    * event-time order (the iterator carries no order guarantee); ACROSS
    * batches a step only fires strictly after the recorded previous-step
    * time, so results converge to the batch funnel when ingestion is
    * time-ordered — the monitoring deployment this exists for. Shape:
    * one shuffle on user_id, 24 bytes of state per user, update-mode.
    */
  def funnelStates(events: Dataset[TypedEvent]): Dataset[FunnelSnapshot] = {
    import events.sparkSession.implicits._
    val Unset = Long.MinValue
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelSnapshot](GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[TypedEvent], state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(Unset, Unset, Unset))
          evs.toSeq.sortBy(e => (e.event_time.getTime, e.event_type)).foreach { e =>
            val t = e.event_time.getTime * 1000L
            e.event_type match {
              case "view" if s.s1_us == Unset => s = s.copy(s1_us = t)
              case "click" if s.s2_us == Unset && s.s1_us != Unset &&
                t > s.s1_us => s = s.copy(s2_us = t)
              case "purchase" if s.s3_us == Unset && s.s2_us != Unset &&
                t > s.s2_us => s = s.copy(s3_us = t)
              case _ => ()
            }
          }
          state.update(s)
          val depth = if (s.s3_us != Unset) 3L
            else if (s.s2_us != Unset) 2L
            else if (s.s1_us != Unset) 1L else 0L
          FunnelSnapshot(uid, depth, s.s1_us, s.s2_us, s.s3_us)
      }
  }

  /** Stream-stream INTERVAL join: attribute each purchase to every view
    * by the same user in the preceding `horizon` — the ad-attribution /
    * feature-join shape that needs two live streams, not a static dim.
    *
    * Both sides carry watermarks and the join predicate bounds view_time
    * to [purchase_time − horizon, purchase_time], so Spark derives a
    * finite state-retention window per side and evicts join state as the
    * watermark advances — without the time bound the join state would
    * grow forever at 100 TB/day. One shuffle per side on user_id;
    * append-mode output. Last-touch selection (max view per purchase) is
    * a chained stateful agg downstream when needed; this operator emits
    * the full in-horizon pair set.
    *
    * Inputs: views(user_id, event_time), purchases(user_id, event_time,
    * value) — any extra columns pass through the purchase side.
    */
  def attributedPurchases(views: DataFrame, purchases: DataFrame,
                          horizon: String = "1 hour",
                          watermarkDelay: String = "10 minutes"): DataFrame = {
    val v = views
      .select(col("user_id").as("v_user"), col("event_time").as("view_time"))
      .withWatermark("view_time", watermarkDelay)
    val p = purchases
      .withColumnRenamed("event_time", "purchase_time")
      .withWatermark("purchase_time", watermarkDelay)
    p.join(v,
        col("user_id") === col("v_user") &&
          col("view_time") <= col("purchase_time") &&
          col("view_time") >= col("purchase_time") - expr(s"interval $horizon"))
      .drop("v_user")
  }

  /** LEFT-OUTER face of the stream-stream interval join: purchases with
    * NO view by the same user in the preceding `horizon` — the
    * "unattributed conversions" feed (organic-traffic measurement, lost
    * ad-spend audit). In streaming, an outer interval join can emit the
    * null-padded row only when the watermark proves no matching view
    * can still arrive — i.e. unmatched purchases surface on state
    * EVICTION, which is exactly the semantics the audit wants (never
    * claim "organic" while an attributable view may be in flight). The
    * isNull filter then keeps precisely those eviction rows. Same
    * watermark-bounded state shape as [[attributedPurchases]]; batch
    * execution of the same code degenerates to outer-join + filter,
    * which is how the oracle checks it.
    */
  def unattributedPurchases(views: DataFrame, purchases: DataFrame,
                            horizon: String = "1 hour",
                            watermarkDelay: String = "10 minutes"): DataFrame = {
    val v = views
      .select(col("user_id").as("v_user"), col("event_time").as("view_time"))
      .withWatermark("view_time", watermarkDelay)
    val p = purchases
      .withColumnRenamed("event_time", "purchase_time")
      .withWatermark("purchase_time", watermarkDelay)
    p.join(v,
        col("user_id") === col("v_user") &&
          col("view_time") <= col("purchase_time") &&
          col("view_time") >= col("purchase_time") - expr(s"interval $horizon"),
        "left_outer")
      .filter(col("view_time").isNull)
      .drop("v_user", "view_time")
  }

  /** [[userProfiles]] on the transformWithState API (Spark 4): typed
    * state variables from a handle instead of one opaque state object.
    * What the new surface buys at scale: per-variable TTL (`ttl` here —
    * idle users' state expires without hand-rolled timeout plumbing,
    * the state-growth answer for a 100 TB/day keyspace), multiple
    * independent state vars per key, and timers — on the RocksDB state
    * store (the provider transformWithState requires).
    */
  class ProfileProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, UserEvent, UserSnapshot] {
    @transient private var profile: ValueState[UserProfile] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      profile = getHandle.getValueState[UserProfile]("profile",
        Encoders.product[UserProfile], ttl)

    override def handleInputRows(uid: Long, rows: Iterator[UserEvent],
                                 tv: TimerValues): Iterator[UserSnapshot] = {
      val prev =
        if (profile.exists()) profile.get()
        else UserProfile(0L, 0L, Long.MinValue)
      var n = prev.n_events
      var sum = prev.sum_value_c
      var last = prev.last_seen_us
      rows.foreach { e =>
        n += 1
        sum += math.floor(e.value * 100).toLong
        last = math.max(last, e.event_time.getTime * 1000L)
      }
      val next = UserProfile(n, sum, last)
      profile.update(next)
      Iterator.single(UserSnapshot(uid, n, sum, last))
    }
  }

  /** Conversion state: earliest view / purchase micros seen so far
    * (MaxValue = none yet). A min-fold, so snapshots converge to the
    * batch answer regardless of batch boundaries OR within-batch order —
    * stronger than the funnel's ordered-ingestion caveat.
    */
  final case class ConvState(min_view_us: Long, min_purchase_us: Long)

  /** Snapshot carries the (monotone, non-increasing) state mins so any
    * downstream consumer — or a test — can recover the final state with
    * a plain min-aggregate instead of trusting sink row order.
    */
  final case class ConvSnapshot(user_id: Long, min_view_us: Long,
                                min_purchase_us: Long, converted: Boolean,
                                lag_us: Long)

  /** Streaming twin of the oracle-checked `ext_conversion_lag` fold:
    * per-user earliest view and earliest purchase as typed
    * transformWithState state; a user converts when the earliest
    * purchase is strictly after the earliest view. TTL evicts idle
    * users' 16-byte state — the state-growth answer when the keyspace
    * is a 100 TB/day userbase.
    */
  class ConversionProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, TypedEvent, ConvSnapshot] {
    @transient private var st: ValueState[ConvState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[ConvState]("conv",
        Encoders.product[ConvState], ttl)

    override def handleInputRows(uid: Long, rows: Iterator[TypedEvent],
                                 tv: TimerValues): Iterator[ConvSnapshot] = {
      val Unset = Long.MaxValue
      val prev = if (st.exists()) st.get() else ConvState(Unset, Unset)
      var v = prev.min_view_us
      var p = prev.min_purchase_us
      rows.foreach { e =>
        val t = e.event_time.getTime * 1000L
        e.event_type match {
          case "view"     => v = math.min(v, t)
          case "purchase" => p = math.min(p, t)
          case _          => ()
        }
      }
      st.update(ConvState(v, p))
      val conv = v != Unset && p != Unset && p > v
      Iterator.single(ConvSnapshot(uid, v, p, conv, if (conv) p - v else 0L))
    }
  }

  /** Open-session state for the timer-based sessionizer. `timer_ms` is
    * the registered close-timer so re-registration can delete it first
    * (one live timer per user).
    */
  final case class OpenSession(start_us: Long, last_us: Long,
                               n_events: Long, sum_value_c: Long,
                               timer_ms: Long)

  final case class ClosedSession(user_id: Long, session_start_us: Long,
                                 session_end_us: Long, n_events: Long,
                                 sum_value_c: Long)

  /** Gap-based sessionization with EVENT-TIME TIMERS — the third
    * transformWithState capability ([[ProfileProcessor]] exercises typed
    * state + TTL; this exercises `registerTimer`/`handleExpiredTimer`):
    * a session CLOSES and emits exactly once, when the watermark passes
    * last-event + gap, instead of being re-emitted every batch. Append
    * mode, which is what a downstream session-fact sink wants.
    *
    * Within a batch events fold in event-time order; a gap inside one
    * batch closes the old session inline. Emitted boundaries follow the
    * native session_window contract (end = last event + gap, start
    * extends BACKWARDS when a within-watermark out-of-order event
    * arrives in a later batch), so closed sessions match
    * [[sessionStats]] / the `stream_sessions_batch` oracle whenever
    * cross-batch disorder is bounded by the gap — i.e. watermarkDelay ≤
    * gap, the sane deployment configuration. An event arriving more
    * than gap BEFORE the open session (only possible when delay > gap)
    * closes immediately as its own single-event session — the one
    * documented divergence from full session_window merging.
    *
    * Scale: one shuffle on user_id; state per user = one OpenSession +
    * one timer, evicted on close — bounded by LIVE sessions, not users
    * ever seen.
    */
  class SessionTimerProcessor(gapMs: Long)
      extends StatefulProcessor[Long, UserEvent, ClosedSession] {
    @transient private var st: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[OpenSession]("open",
        Encoders.product[OpenSession], TTLConfig.NONE)

    private def closed(uid: Long, s: OpenSession): ClosedSession =
      ClosedSession(uid, s.start_us, s.last_us + gapMs * 1000L,
        s.n_events, s.sum_value_c)

    override def handleInputRows(uid: Long, rows: Iterator[UserEvent],
                                 tv: TimerValues): Iterator[ClosedSession] = {
      val out = List.newBuilder[ClosedSession]
      var cur: Option[OpenSession] =
        if (st.exists()) Some(st.get()) else None
      rows.toSeq.sortBy(_.event_time.getTime).foreach { e =>
        val tUs = e.event_time.getTime * 1000L
        val vc = math.floor(e.value * 100).toLong
        cur match {
          // session_window merge contract: an event joins the open
          // session iff it lands within gap of the session INTERVAL —
          // [start − gap, last + gap]. A within-watermark event EARLIER
          // than the open start must extend the start backwards (a
          // later batch can legally carry it under the watermark
          // delay); only updating last_us would mis-report start.
          case Some(s) if tUs >= s.start_us - gapMs * 1000L &&
              tUs - s.last_us <= gapMs * 1000L =>
            cur = Some(s.copy(start_us = math.min(s.start_us, tUs),
              last_us = math.max(s.last_us, tUs),
              n_events = s.n_events + 1, sum_value_c = s.sum_value_c + vc))
          case Some(s) if tUs > s.last_us => // in-batch forward gap:
            out += closed(uid, s) // close inline, start fresh
            cur = Some(OpenSession(tUs, tUs, 1L, vc, 0L))
          case Some(s) => // stray event more than gap BEFORE the open
            // session: nothing later can merge with it (the open session
            // starts > tUs + gap and the fold is time-ordered), so it
            // closes immediately as its own session
            out += closed(uid, OpenSession(tUs, tUs, 1L, vc, 0L))
            cur = Some(s)
          case None =>
            cur = Some(OpenSession(tUs, tUs, 1L, vc, 0L))
        }
      }
      cur.foreach { s =>
        if (s.timer_ms > 0L) getHandle.deleteTimer(s.timer_ms)
        val expiry = s.last_us / 1000L + gapMs
        getHandle.registerTimer(expiry)
        st.update(s.copy(timer_ms = expiry))
      }
      out.result().iterator
    }

    override def handleExpiredTimer(uid: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[ClosedSession] =
      if (st.exists() && st.get().timer_ms == info.getExpiryTimeInMs) {
        val s = st.get()
        st.clear()
        Iterator.single(closed(uid, s))
      } else Iterator.empty
  }

  /** [[SessionTimerProcessor]] wired up: watermarked input, event-time
    * mode, append output.
    */
  def sessionsTws(events: Dataset[UserEvent],
                  gap: String = "30 minutes",
                  watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    // a month has no fixed millisecond length — silently treating it as
    // 0 would close every session instantly
    require(iv.months == 0, s"gap '$gap' must not use month units")
    val gapMs = iv.days * 86400000L + iv.microseconds / 1000L
    events
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  def conversionLagTws(events: Dataset[TypedEvent],
                       ttl: TTLConfig = TTLConfig.NONE): Dataset[ConvSnapshot] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new ConversionProcessor(ttl),
        TimeMode.None(), OutputMode.Update())
  }

  def userProfilesTws(events: Dataset[UserEvent],
                      ttl: TTLConfig = TTLConfig.NONE): Dataset[UserSnapshot] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new ProfileProcessor(ttl),
        TimeMode.None(), OutputMode.Update())
  }

  /** Custom per-key state via mapGroupsWithState: a running per-user
    * profile (event count, value sum in cents, last-seen micros) updated
    * every micro-batch — the KeyValueGroupedDataset stateful surface for
    * aggregates session windows can't express. Update-mode sink.
    */
  def userProfiles(events: Dataset[UserEvent]): Dataset[UserSnapshot] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserProfile, UserSnapshot](GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[UserEvent], state: GroupState[UserProfile]) =>
          val prev = state.getOption.getOrElse(UserProfile(0L, 0L, Long.MinValue))
          var n = prev.n_events
          var sum = prev.sum_value_c
          var last = prev.last_seen_us
          evs.foreach { e =>
            n += 1
            sum += math.floor(e.value * 100).toLong
            last = math.max(last, e.event_time.getTime * 1000L)
          }
          val next = UserProfile(n, sum, last)
          state.update(next)
          UserSnapshot(uid, next.n_events, next.sum_value_c, next.last_seen_us)
      }
  }

  // ------------------------------------------------------------ batch twins
  //
  // Oracle-checkable batch equivalents of the two streaming-only operators,
  // so their semantics are verified by the same DuckDB gate as everything
  // else (a streaming query can't be hash-compared against a SQL oracle).

  /** Batch twin of [[attributedPurchases]]: runs the SAME operator — the
    * interval-join predicate is identical code; `withWatermark` is a no-op
    * on a bounded Dataset — over the events table, views vs purchases by
    * the same user within the 1-hour horizon. Timestamps come out as
    * integer epoch-micros and value as integer cents so the comparison is
    * exact.
    */
  def attributedPurchasesBatch(spark: org.apache.spark.sql.SparkSession,
                               dir: String): DataFrame = {
    val ev = graft.engine.ingest.Sources.events(spark, dir)
      .withColumn("event_time", timestamp_micros(col("ts_us")))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_time"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("event_time"), col("value"))
    attributedPurchases(views, purchases)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("purchase_time")).as("purchase_us"),
        unix_micros(col("view_time")).as("view_us"),
        floor(col("value") * 100 + 0.5).cast("long").as("value_c"))
      .orderBy(col("event_id"), col("view_us"))
  }

  /** Batch twin of [[userProfilesTws]]/[[userProfiles]]: the stateful
    * processors fold (count, Σ floor(value·100), max last-seen) per user —
    * over a bounded input that fold IS a groupBy, stated here as one so
    * the oracle can check it. last_seen replicates the processors'
    * `Timestamp.getTime * 1000` exactly: millisecond truncation first,
    * then micros (integer div, not a double round-trip).
    */
  /** Batch twin of [[sessionStats]]: runs the SAME operator — Spark's
    * native session_window aggregates in batch mode too; the watermark
    * is a no-op on bounded input — over the events table. Emits integer
    * epoch-micros boundaries (window end = last event + gap, the native
    * session_window contract) and integer cents so the DuckDB
    * gaps-and-islands oracle compares exactly.
    */
  def sessionStatsBatch(spark: org.apache.spark.sql.SparkSession,
                        dir: String): DataFrame = {
    val ev = graft.engine.ingest.Sources.events(spark, dir)
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .select(col("user_id"), col("event_time"), col("value"))
    sessionStats(ev)
      .select(col("user_id"),
        unix_micros(col("session_start")).as("session_start_us"),
        unix_micros(col("session_end")).as("session_end_us"),
        col("n_events"), col("sum_value_c"))
      .orderBy(col("user_id"), col("session_start_us"))
  }

  def userProfilesBatch(spark: org.apache.spark.sql.SparkSession,
                        dir: String): DataFrame =
    graft.engine.ingest.Sources.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100).cast("long")).as("sum_value_c"),
        max(expr("(ts_us div 1000) * 1000")).as("last_seen_us"))
      .orderBy(col("user_id"))

  /** Batch twin of [[sessionsTws]] — the event-time-TIMER sessionizer.
    * Over a bounded time-ordered replay, the processor's append-once
    * emission is exactly the gap-bounded session fold on its
    * MILLISECOND clock (`Timestamp.getTime` truncates the micros the
    * native session_window keeps — the one arithmetic difference from
    * [[sessionStatsBatch]]): a session breaks on a >gap jump in
    * ms-truncated event time, closes at last + gap, and sums the
    * per-event `floor(value·100)` cents. Batch transformWithState
    * cannot run the processor itself (event-time timers need a
    * watermark, which bounded execution has none of — verified: the
    * EventTime mode throws), so the fold is STATED here and
    * StreamingSpec closes the loop by replaying the same sf0.001
    * fixture through the real RocksDB-backed processor and asserting
    * set equality with this twin. Scale shape matches the processor:
    * one shuffle on user_id, per-user windows — never a global sort.
    */
  def timerSessionsBatch(spark: org.apache.spark.sql.SparkSession,
                         dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapUs = 30L * 60 * 1000 * 1000
    val ev = graft.engine.ingest.Sources.events(spark, dir).select(
      col("user_id"),
      expr("(ts_us div 1000) * 1000").as("t_us"), // the processor's ms clock
      floor(col("value") * 100).cast("long").as("value_c"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("t_us"))
    ev
      .withColumn("prev", lag(col("t_us"), 1).over(w))
      .withColumn("brk", when(
        col("prev").isNull || col("t_us") - col("prev") > gapUs, 1L)
        .otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("t_us")).as("session_start_us"),
        (max(col("t_us")) + gapUs).as("session_end_us"),
        count(lit(1)).as("n_events"),
        sum(col("value_c")).as("sum_value_c"))
      .select(col("user_id"), col("session_start_us"),
        col("session_end_us"), col("n_events"), col("sum_value_c"))
      .orderBy(col("user_id"), col("session_start_us"))
  }

  /** Batch twin of [[unattributedPurchases]] — runs the SAME left-outer
    * interval-join + null-filter operator code on bounded input
    * (`withWatermark` is a batch no-op): purchases with no in-horizon
    * view, i.e. the set complement of [[attributedPurchasesBatch]]'s
    * purchase ids. The oracle states it as NOT EXISTS.
    */
  def unattributedPurchasesBatch(spark: org.apache.spark.sql.SparkSession,
                                 dir: String): DataFrame = {
    val ev = graft.engine.ingest.Sources.events(spark, dir)
      .withColumn("event_time", timestamp_micros(col("ts_us")))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_time"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("event_time"), col("value"))
    unattributedPurchases(views, purchases)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("purchase_time")).as("purchase_us"),
        floor(col("value") * 100 + 0.5).cast("long").as("value_c"))
      .orderBy(col("event_id"))
  }

  /** Batch twin of the CHAINED streaming shape (interval join → a
    * downstream stateful rollup — the two-stateful-operator query
    * StreamingSpec drives): LAST-TOUCH attribution. Runs the SAME
    * [[attributedPurchases]] operator code on bounded input, then
    * collapses each purchase's in-horizon view set to the last touch
    * (max view time) plus the attributed-view count — the rollup the
    * interval-join docstring defers downstream. Scale: the join
    * shuffles on user_id with horizon-bounded fan-out, the rollup
    * shuffles on the purchase id — both key-grain, no global stage.
    */
  def lastTouchBatch(spark: org.apache.spark.sql.SparkSession,
                     dir: String): DataFrame = {
    val ev = graft.engine.ingest.Sources.events(spark, dir)
      .withColumn("event_time", timestamp_micros(col("ts_us")))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_time"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("event_time"), col("value"))
    attributedPurchases(views, purchases)
      .groupBy(col("event_id"), col("user_id"), col("purchase_time"),
        col("value"))
      .agg(max(col("view_time")).as("last_view"),
        count(lit(1)).as("n_views"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("purchase_time")).as("purchase_us"),
        unix_micros(col("last_view")).as("last_view_us"),
        col("n_views"),
        floor(col("value") * 100 + 0.5).cast("long").as("value_c"))
      .orderBy(col("event_id"))
  }
}
