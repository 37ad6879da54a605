package graft.engine.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe EXACT global rank / NTILE over an arbitrary total order —
  * the replacement for `ntile(n).over(Window.orderBy(...))`, whose
  * unpartitioned window funnels the whole input through ONE task. Built
  * for the user-grain quantile cuts ([[Sessionize.rfmSegments]],
  * [[Sessionize.valueConcentration]]) where "the whole input" is
  * plausibly 10⁸–10⁹ rows at the 100 TB design point.
  *
  * Shape (the range-sorted zipWithIndex rank):
  *  1. range-repartition on the order key + sort within partitions —
  *     the same parallel distributed sort `ORDER BY` itself plans;
  *  2. per-partition contiguous 0-based position from
  *     `monotonically_increasing_id()` (partition id in the upper 31
  *     bits, a CONTIGUOUS record number in the lower 33), assigned
  *     above the local sort so it IS the sorted position;
  *  3. a per-partition row-count census (≤ shuffle partitions rows)
  *     turned into cumulative rank offsets by a census-sized window —
  *     the only unpartitioned window left, over ~32 rows;
  *  4. broadcast-join the offsets back: rank = offset + position + 1.
  * The census branch and the data branch reference the SAME range
  * exchange subtree, so ReuseExchange executes the upstream plan once
  * and the census re-reads its shuffle files; every stage is
  * embarrassingly parallel and nothing ever single-partitions. The
  * reuse is CORRECTNESS-critical, not just a saving — the range
  * partitioner samples its boundaries from the upstream data, so two
  * independent executions over a nondeterministically-ordered upstream
  * could disagree on partition ids between the branches — and is
  * therefore pinned by ScaleRankSpec ("census branch REUSES …": exactly
  * one materialized range exchange, a ReusedExchangeExec for the other
  * consumer, in the AQE-final executed plan).
  *
  * Correctness contract:
  *  - `order` MUST be a total order (end it with a unique tiebreaker —
  *    the same requirement deterministic NTILE already imposes). With
  *    duplicate full keys the range partitioner may split a tie group
  *    across partitions and positions within the group would be
  *    arbitrary.
  *  - The id projection is nondeterministic, and Catalyst's
  *    EliminateSorts refuses to drop a sort underneath a
  *    nondeterministic projection — the local sort the position depends
  *    on cannot be optimized away.
  *  - Bucket arithmetic replicates SQL NTILE bit-exactly (first
  *    N mod n buckets hold ⌈N/n⌉ rows, the rest ⌊N/n⌋), all in integer
  *    `div`/`%` — so a DuckDB `ntile(n) OVER (ORDER BY …)` oracle
  *    transfers unchanged.
  */
object ScaleRank {

  /** Lower-bit width of the per-partition record number inside
    * `monotonically_increasing_id()` (Spark contract: 33 bits). */
  private val LocalBits = 33

  /** `df` plus column `out` = exact global 1-based rank of each row
    * under the total order `order`. No single-partition stage. */
  def withGlobalRank(df: DataFrame, out: String, order: Column*): DataFrame =
    ranked(df, out, order).drop("_sr_total")

  /** [[withGlobalRank]] plus `countOut` = the TOTAL row count, carried
    * on every row (it rides the same broadcast census — free). Use it
    * when a consumer needs n alongside the rank (quantile target
    * selection): deriving n any other way re-executes the input as a
    * second aggregate branch — a second full scan at scale.
    */
  def withGlobalRankAndCount(df: DataFrame, out: String, countOut: String,
                             order: Column*): DataFrame =
    ranked(df, out, order).withColumnRenamed("_sr_total", countOut)

  /** `df` plus column `out` = the exact SQL `NTILE(n)` bucket (1..n,
    * LongType) of each row under the total order `order`. */
  def withNtile(df: DataFrame, out: String, n: Int, order: Column*)
      : DataFrame = {
    require(n > 0, s"ntile bucket count must be positive, got $n")
    ranked(df, "_sr_rank", order)
      .withColumn(out, ntileOfRank(n))
      .drop("_sr_rank", "_sr_total")
  }

  /** Adds `out` (the global rank) and `_sr_total` (total row count —
    * every row carries it, broadcast-joined, for bucket math). */
  private def ranked(df: DataFrame, out: String, order: Seq[Column])
      : DataFrame = {
    val parted = df
      .repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_sr_mid", monotonically_increasing_id())
      .withColumn("_sr_pid", shiftright(col("_sr_mid"), LocalBits))
      .withColumn("_sr_loc",
        col("_sr_mid").bitwiseAND(lit((1L << LocalBits) - 1)))
    val census = parted
      .groupBy(col("_sr_pid"))
      .agg(count(lit(1)).as("_sr_pn"))
    // census-sized windows (≤ spark.sql.shuffle.partitions rows): the
    // established tiny-window pattern (disorderCensus block HWM), not a
    // data-sized global window.
    val wOff = Window.orderBy(col("_sr_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.orderBy(col("_sr_pid"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = census.select(
      col("_sr_pid"),
      coalesce(sum(col("_sr_pn")).over(wOff), lit(0L)).as("_sr_off"),
      sum(col("_sr_pn")).over(wTot).as("_sr_total"))
    parted
      .join(broadcast(offsets), Seq("_sr_pid"))
      .withColumn(out, col("_sr_off") + col("_sr_loc") + lit(1L))
      .drop("_sr_mid", "_sr_pid", "_sr_loc", "_sr_off")
  }

  /** `df` plus column `out` = exact PER-GROUP 1-based rank under the
    * total order `order` within each value of column `grp` — the
    * skew-immune replacement for `row_number().over(Window.partitionBy
    * (grp).orderBy(...))` when groups are FEW and FAT (per-type
    * percentiles over a 5-type event log at 100 TB: partitionBy gives a
    * |groups|-way parallelism ceiling and one task owns the biggest
    * type; this splits every group across range partitions).
    *
    * Shape: ONE range exchange on (grp, order...) — fat groups span
    * many partitions — then a (partition, group) census (size
    * O(partitions + groups): the sorted layout makes each partition
    * hold a contiguous (grp, order) slice, so cells ≈ partitions +
    * group boundaries). The census yields, per cell, the group's
    * in-partition start (min local position) and, via a census-sized
    * window PARTITIONED by group, the rows of the same group in all
    * earlier partitions. rank = cross-partition offset + (local
    * position − in-partition group start) + 1, attached by one
    * broadcast join — the data is never shuffled a second time.
    *
    * Contract: built for |groups| small enough to broadcast the census
    * (≲10⁵). For high-cardinality grouping keys use the plain
    * partitionBy window — millions of small groups are exactly the case
    * it parallelizes well.
    */
  def withGroupRank(df: DataFrame, out: String, grp: String,
                    order: Column*): DataFrame =
    groupRanked(df, out, grp, order).drop("_sr_gn")

  /** [[withGroupRank]] plus `countOut` = the GROUP's row count on every
    * row (from the same census broadcast — free; see
    * [[withGlobalRankAndCount]] for why consumers should take it here
    * rather than re-aggregating the input).
    */
  def withGroupRankAndCount(df: DataFrame, out: String, countOut: String,
                            grp: String, order: Column*): DataFrame =
    groupRanked(df, out, grp, order).withColumnRenamed("_sr_gn", countOut)

  /** `df` plus column `out` = exact per-group `NTILE(n)` bucket (1..n,
    * LongType) under `order` within each value of `grp` — the grouped
    * face of [[withNtile]], same skew-immune shape as [[withGroupRank]].
    */
  def withGroupNtile(df: DataFrame, out: String, n: Int, grp: String,
                     order: Column*): DataFrame = {
    require(n > 0, s"ntile bucket count must be positive, got $n")
    groupRanked(df, "_sr_rank", grp, order)
      .withColumnRenamed("_sr_gn", "_sr_total")
      .withColumn(out, ntileOfRank(n))
      .drop("_sr_rank", "_sr_total")
  }

  /** Adds `out` (per-group rank) and `_sr_gn` (the group's total row
    * count, carried on every row for bucket math).
    */
  private def groupRanked(df: DataFrame, out: String, grp: String,
                          order: Seq[Column]): DataFrame = {
    val fullOrder = col(grp) +: order
    val parted = df
      .repartitionByRange(fullOrder: _*)
      .sortWithinPartitions(fullOrder: _*)
      .withColumn("_sr_mid", monotonically_increasing_id())
      .withColumn("_sr_pid", shiftright(col("_sr_mid"), LocalBits))
      .withColumn("_sr_loc",
        col("_sr_mid").bitwiseAND(lit((1L << LocalBits) - 1)))
    val census = parted
      .groupBy(col("_sr_pid"), col(grp))
      .agg(count(lit(1)).as("_sr_pn"), min(col("_sr_loc")).as("_sr_start"))
    // census-sized windows, PARTITIONED by group — never data-sized
    val wOff = Window.partitionBy(col(grp)).orderBy(col("_sr_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(col(grp))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = census.select(
      col("_sr_pid").as("_sr_opid"), col(grp).as("_sr_ogrp"),
      col("_sr_start"),
      coalesce(sum(col("_sr_pn")).over(wOff), lit(0L)).as("_sr_off"),
      sum(col("_sr_pn")).over(wTot).as("_sr_gn"))
    // NULL-SAFE on the group key (<=>): a plain equi-join would silently
    // DROP every null-group row (no census match), where the
    // row_number/ntile partitionBy window this replaces ranks the null
    // group like any other — the census itself already groups nulls
    // together, so <=> restores the drop-in contract.
    parted
      .join(broadcast(offsets),
        col("_sr_pid") === col("_sr_opid") && col(grp) <=> col("_sr_ogrp"))
      .withColumn(out,
        col("_sr_off") + (col("_sr_loc") - col("_sr_start")) + lit(1L))
      .drop("_sr_mid", "_sr_pid", "_sr_opid", "_sr_ogrp", "_sr_loc",
        "_sr_off", "_sr_start")
  }

  /** SQL NTILE from (`_sr_rank`, `_sr_total`): with N rows, the first
    * rem = N % n buckets hold q+1 = N div n + 1 rows, the rest q. All
    * integer arithmetic — no double division to round wrong at bucket
    * boundaries near 2⁵³. The ELSE divides by q, which is 0 only when
    * N < n — and then cut = N, so every rank takes the THEN branch and
    * CASE's lazy evaluation never executes the division. */
  private def ntileOfRank(n: Int): Column = expr(
    s"""CASE WHEN _sr_rank <= (_sr_total % $n) * (_sr_total div $n + 1)
       |     THEN (_sr_rank - 1) div (_sr_total div $n + 1) + 1
       |     ELSE (_sr_total % $n)
       |          + (_sr_rank - (_sr_total % $n) * (_sr_total div $n + 1) - 1)
       |            div (_sr_total div $n) + 1
       |END""".stripMargin)
}
