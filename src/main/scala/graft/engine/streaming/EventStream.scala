package graft.engine.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

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
}
