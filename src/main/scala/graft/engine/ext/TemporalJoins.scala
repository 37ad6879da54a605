package graft.engine.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and range joins — temporal operators Spark has no native relation
  * for (SURVEY.md §2.9), built by composition (the preference-(a) path:
  * no custom plan node needed, and the composed shapes scale):
  *
  *  - as-of: tag both sides, ONE window over (key, time) carries the
  *    last-seen left row forward — a single shuffle on the key, no
  *    per-row probe join, no range explosion. This is the standard
  *    large-scale as-of shape (vs. a nested-loop inequality join, which
  *    is O(N·M) per key).
  *  - range: bucket the probe interval onto a time grid and equi-join on
  *    (key, bucket), then filter exactly — turns an inequality join into
  *    a bounded equi-join (2 buckets per probe for window <= bucket
  *    width), broadcast/shuffle-plannable like any other join.
  *
  * Both read the `events` table shape: (event_id, user_id, ts_us,
  * event_type, value).
  */
object TemporalJoins {

  private def events(spark: SparkSession, dir: String): DataFrame =
    graft.engine.ingest.Sources.events(spark, dir)

  /** As-of join: for every purchase event, the latest click of the same
    * user at-or-before the purchase (ties on timestamp resolved to the
    * highest click event_id; purchases with no prior click keep NULLs).
    * Output: (purchase_id, purchase_ts_us, user_id, click_id, click_ts_us,
    * gap_us), ordered by purchase_id.
    */
  def asofClickBeforePurchase(spark: SparkSession, dir: String): DataFrame =
    asofClickBeforePurchase(events(spark, dir))

  def asofClickBeforePurchase(ev: DataFrame): DataFrame = {
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), lit(0).as("kind"),
        col("event_id").as("click_id"), lit(null).cast("long").as("purchase_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), lit(1).as("kind"),
        lit(null).cast("long").as("click_id"), col("event_id").as("purchase_id"))

    // kind 0 < 1 sorts a click before a purchase at the same timestamp
    // (at-or-before inclusive); click_id last in the ordering makes the
    // carried value the HIGHEST click id among same-timestamp clicks.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("kind"), col("click_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    clicks.unionByName(purchases)
      .withColumn("asof_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("asof_click_ts", last(
        when(col("kind") === 0, col("ts_us")), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("purchase_id"), col("ts_us").as("purchase_ts_us"),
        col("user_id"), col("asof_click_id").as("click_id"),
        col("asof_click_ts").as("click_ts_us"),
        (col("ts_us") - col("asof_click_ts")).as("gap_us"))
      .orderBy(col("purchase_id"))
  }

  /** Range join: views of the same user within the hour before each
    * purchase ([ts - windowUs, ts], inclusive both ends). The view side is
    * bucketed on the hour grid and each purchase probes its own and the
    * previous bucket — an equi-join on (user_id, bucket) plus an exact
    * range filter, never an inequality join. Output: (purchase_id,
    * n_views), every purchase present (0 when none), ordered.
    */
  def viewsBeforePurchase(spark: SparkSession, dir: String): DataFrame =
    viewsBeforePurchase(events(spark, dir))

  def viewsBeforePurchase(ev: DataFrame,
                          windowUs: Long = 3600L * 1000 * 1000): DataFrame = {
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts_us").as("view_ts"),
        (col("ts_us") / windowUs).cast("long").as("bucket"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts_us"),
        explode(array((col("ts_us") / windowUs).cast("long") - 1,
          (col("ts_us") / windowUs).cast("long"))).as("bucket"))

    purchases
      .join(views, Seq("user_id", "bucket"), "left")
      // Nullify (not filter) out-of-range views: dropping rows could erase
      // a purchase whose every bucket-mate is out of range; count() then
      // skips the nulls and every purchase keeps its row.
      .withColumn("in_range_view", when(
        col("view_ts") >= col("ts_us") - windowUs &&
          col("view_ts") <= col("ts_us"), col("view_id")))
      .groupBy(col("purchase_id"))
      .agg(count(col("in_range_view")).as("n_views"))
      .orderBy(col("purchase_id"))
  }
}
