package graft.engine.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.expr.Normalizers
import graft.engine.mongo.MongoLogPipeline

/** Structured Streaming variant of the Mongo slow-query pipeline
  * (SURVEY.md §2.9: the mongo DAG is trivially streamable — stateless
  * routes plus one windowed aggregation).
  *
  * Input: a streaming DataFrame of raw log lines (`value: String`), e.g.
  * `spark.readStream.text(dir)` or a socket/Kafka source. The batch
  * pipeline's parse/route column logic is reused verbatim — the only
  * change is time semantics: the batch "first in file order" sample
  * (line_no) becomes "earliest event time", and A1's global aggregation
  * becomes a watermarked tumbling-window aggregation so state is bounded
  * and late lines are handled.
  */
object MongoStream {

  /** Routing flags on a streaming scan: identical logic to the batch
    * [[MongoLogPipeline.parsedScan]] minus the line-number provenance
    * (file order does not exist in a stream; event time replaces it).
    */
  def parsedScan(lines: DataFrame): DataFrame =
    MongoLogPipeline.parsedScan(
      lines.select(col("value").as("line"), lit(null).cast("long").as("line_no")))
      .withColumn("event_time", to_timestamp(col("j.t.`$date`")))

  /** R1 detailed slow-query rows (streaming: append-mode friendly,
    * stateless).
    */
  def detailed(scan: DataFrame): DataFrame =
    MongoLogPipeline.detailed(scan)
      .drop("line_no")
      .withColumn("event_time", to_timestamp(col("timestamp")))

  /** A1 as a watermarked tumbling-window aggregation: one stats row per
    * (window, query pattern). State is bounded by the watermark horizon —
    * the property that keeps this runnable forever at 100 TB/day.
    * The sample is the earliest-in-event-time full command (min_by), the
    * streaming analog of the batch pipeline's first-in-file-order sample.
    */
  def windowedQueryStats(scan: DataFrame,
                         windowLen: String = "1 minute",
                         watermarkDelay: String = "5 minutes"): DataFrame =
    detailed(scan)
      .filter(col("event_time").isNotNull)
      .withWatermark("event_time", watermarkDelay)
      .groupBy(
        window(col("event_time"), windowLen),
        Normalizers.normalizeMongoQuery(col("Command")).as("Query Pattern"))
      .agg(
        count(lit(1)).as("Executions"),
        min(col("Duration(ms)")).as("Min Duration(ms)"),
        max(col("Duration(ms)")).as("Max Duration(ms)"),
        round(avg(col("Duration(ms)")), 2).as("Avg Duration(ms)"),
        min_by(col("Command"), col("event_time")).as("Sample Full Query"))

  /** R2 error rollup, windowed like A1. */
  def windowedErrors(scan: DataFrame,
                     windowLen: String = "1 minute",
                     watermarkDelay: String = "5 minutes"): DataFrame =
    scan.filter(col("valid") && col("is_error"))
      .filter(col("event_time").isNotNull)
      .withWatermark("event_time", watermarkDelay)
      .groupBy(
        window(col("event_time"), windowLen),
        col("j.msg").as("msg"),
        coalesce(col("j.attr.error.codeName"), lit("N/A")).as("error"),
        coalesce(col("j.attr.error.errmsg"), lit("N/A")).as("errmsg"))
      .agg(count(lit(1)).as("totalCount"),
        min_by(Normalizers.pyStrip(col("line")), col("event_time")).as("SampleLine"))
}
