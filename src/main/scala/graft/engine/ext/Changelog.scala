package graft.engine.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Changelog (CDC) apply: fold an ordered upsert/delete stream into a
  * latest-wins keyed snapshot, and do it INCREMENTALLY — base state +
  * delta batch → merged state — the way a warehouse applies a day's
  * change capture to yesterday's snapshot (Delta/Iceberg `MERGE INTO`
  * semantics, stated as a join).
  *
  * The `events` table stands in for the changelog: key = `user_id`,
  * change order = (`ts_us`, `event_id`) (event_id breaks equal-timestamp
  * ties, exactly like a log sequence number), and a deterministic op
  * column marks every 13th event a DELETE tombstone — the synthetic
  * stand-in for the source system's op code, derived (not random) so
  * every engine sees the same stream.
  *
  * Scale shape: each state build is ONE hash aggregation (`max_by` on the
  * LSN struct — no window, no sort); the merge is one equi-join of two
  * key-grain tables, each already far smaller than the event log. At
  * 100 TB the delta side is a day's partition pruned by the cutoff
  * predicate; nothing rescans history.
  */
object Changelog {

  /** LSN-latest state of one changelog slice: per key, the newest op's
    * payload plus the op count. `max_by` over the (ts_us, event_id)
    * struct is deterministic — the struct comparison is total because
    * event_id is unique.
    */
  def state(slice: DataFrame): DataFrame =
    slice.groupBy(col("user_id"))
      .agg(
        max_by(
          struct(col("op"), col("event_type"), col("value_c")),
          struct(col("ts_us"), col("event_id"))).as("last"),
        max(col("ts_us")).as("last_ts_us"),
        count(lit(1)).as("n_ops"))
      .select(col("user_id"), col("last.op").as("op"),
        col("last.event_type").as("event_type"),
        col("last.value_c").as("value_c"),
        col("last_ts_us"), col("n_ops"))

  /** The events table as a changelog: op = 'D' for every event_id
    * divisible by 13, else 'U'; value integer-quantized to cents.
    */
  def asChangelog(ev: DataFrame): DataFrame =
    ev.select(col("event_id"), col("user_id"), col("ts_us"),
      col("event_type"),
      floor(col("value") * 100).cast("long").as("value_c"),
      when(pmod(col("event_id"), lit(13L)) === 0L, "D").otherwise("U")
        .as("op"))

  /** Incremental merge: base-state ⟕⟖ delta-state, delta wins where
    * present (its LSNs are strictly newer under a time-split), op counts
    * add, and keys whose FINAL op is a delete tombstone drop out of the
    * snapshot. With a time-split changelog this equals the one-shot
    * latest-wins fold over the full log — the invariant the oracle (and
    * [[mergedSnapshot]]'s structure) checks.
    */
  def merge(baseState: DataFrame, deltaState: DataFrame): DataFrame = {
    val b = baseState.select(
      col("user_id"),
      struct(col("op"), col("event_type"), col("value_c"),
        col("last_ts_us")).as("b_last"),
      col("n_ops").as("b_ops"))
    val d = deltaState.select(
      col("user_id"),
      struct(col("op"), col("event_type"), col("value_c"),
        col("last_ts_us")).as("d_last"),
      col("n_ops").as("d_ops"))
    b.join(d, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("d_last"), col("b_last")).as("last"),
        (coalesce(col("b_ops"), lit(0L)) + coalesce(col("d_ops"), lit(0L)))
          .as("n_ops"))
      .filter(col("last.op") === "U")
      .select(col("user_id"), col("last.event_type").as("event_type"),
        col("last.value_c").as("value_c"),
        col("last.last_ts_us").as("last_ts_us"), col("n_ops"))
  }

  /** Registry query: split the changelog at the midpoint day, fold each
    * side, merge — the emitted snapshot is the incremental path's result,
    * which must equal a direct latest-wins fold of the whole log (what
    * the SQL oracle states).
    */
  def mergedSnapshot(spark: SparkSession, dir: String): DataFrame =
    mergedSnapshot(graft.engine.ingest.Sources.events(spark, dir))

  def mergedSnapshot(ev: DataFrame): DataFrame = {
    val log = asChangelog(ev).withColumn("day", expr("ts_us div 86400000000"))
    // midpoint cutoff from the data itself (1-row aggregate, broadcast —
    // the canonical scalar-subquery shape used throughout this repo)
    val cutoff = log.agg(
      expr("(min(day) + max(day) + 1) div 2").as("cut_day"))
    val withCut = log.crossJoin(broadcast(cutoff))
    val base = state(withCut.filter(col("day") < col("cut_day")))
    val delta = state(withCut.filter(col("day") >= col("cut_day")))
    merge(base, delta).orderBy(col("user_id"))
  }
}
