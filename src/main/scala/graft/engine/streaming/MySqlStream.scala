package graft.engine.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.mysql.MySqlLogPipeline

/** Structured Streaming variant of the MySQL slow-log pipeline
  * (SURVEY.md §2.9 flagged this as the one non-streamable branch because
  * the parity path splits whole files; this closes it).
  *
  * The batch scale reader ([[graft.engine.ingest.Sources.readDelimited]])
  * gets entry records from Hadoop's `textinputformat.record.delimiter`,
  * which has no streaming hook — but the text DATASOURCE's `lineSep`
  * option produces the same record shape and works under `readStream`:
  * each record is one slow-log entry body, split at `"\n# Time: "`, and
  * new files landing in the directory stream in incrementally. The
  * record-restoration rules mirror `readDelimited` exactly, with one
  * difference: streaming records carry no byte offset, so "first record
  * of its file" is recognized by its verbatim `# Time: ` prefix instead
  * of offset 0. A non-entry file preamble therefore gets the marker
  * prepended and flows to the WARNINGS channel (P10 gate) instead of
  * being silently dropped — at worst one diagnostic row per file, and
  * arguably the more honest treatment for a tailing deployment.
  *
  * Everything downstream reuses [[MySqlLogPipeline.parseEntries]]
  * verbatim — the regex battery is a stateless projection, so the only
  * streaming state is the windowed aggregate, bounded by the watermark.
  */
object MySqlStream {

  /** Streaming entry source over a log directory. */
  def entryStream(spark: SparkSession, path: String,
                  maxFilesPerTrigger: Int = 0): DataFrame = {
    val r = spark.readStream.option("lineSep", "\n# Time: ")
    val r2 = if (maxFilesPerTrigger > 0)
      r.option("maxFilesPerTrigger", maxFilesPerTrigger) else r
    restoreEntries(r2.text(path))
  }

  /** Delimiter-stripped records (`value: String`) → the
    * (file_id, entry_no, ord, entry) shape [[MySqlLogPipeline.parseEntries]]
    * expects. File order doesn't exist in a stream, so the provenance keys
    * are constants; the streaming aggregate samples by EVENT time instead
    * (see [[windowedAggregate]]), exactly like [[MongoStream]].
    */
  def restoreEntries(records: DataFrame): DataFrame = {
    // A file-first record kept its own "# Time: " header; every split-off
    // record lost the delimiter and needs marker + trailing \n restored
    // (the query-capture regex wants a newline-terminated last line).
    val restored = when(col("value").startsWith("# Time: "), col("value"))
      .otherwise(concat(lit("# Time: "), col("value")))
    records.select(
      lit(0L).as("file_id"), lit(0L).as("entry_no"), lit(0L).as("ord"),
      when(restored.endsWith("\n"), restored)
        .otherwise(concat(restored, lit("\n"))).as("entry"))
      .filter(col("entry") =!= "# Time: \n") // file began with the delimiter
  }

  /** Slow-log `# Time:` values in the wild are either the legacy
    * `yymmdd hh:mm:ss` form or ISO-8601 (5.7+, log_timestamps=UTC/SYSTEM);
    * try_to_timestamp keeps unparsable forms as NULL (filtered before
    * the watermark) instead of failing the stream under ANSI mode.
    *
    * Zone-suffixed forms (`...Z`, `...+05:30`) parse WITH the designator
    * (pattern `X`), so a UTC-stamped 5.7+ log yields the correct instant
    * in ANY session timezone — stripping the `Z` and parsing in session
    * local time would shift every event by the zone offset and move rows
    * across windows. Only the zone-less forms fall back to session-time
    * interpretation (the log carries no better information there).
    */
  def eventTime(time: Column): Column =
    coalesce(
      try_to_timestamp(time, lit("yyMMdd HH:mm:ss")),
      try_to_timestamp(time, lit("yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]XXX")),
      try_to_timestamp(time, lit("yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]")),
      try_to_timestamp(time))

  /** P9-P12 detailed rows on a stream: stateless, append-mode friendly. */
  def detailed(entries: DataFrame): DataFrame =
    MySqlLogPipeline.parseEntries(entries).detailed
      .drop("file_id", "entry_no", "ord")
      .withColumn("event_time", eventTime(col("Time")))

  /** A3 as a watermarked tumbling-window aggregation — one stats row per
    * (window, normalized pattern), state bounded by the watermark horizon.
    * The batch "first in file order" sample becomes earliest-event-time.
    */
  def windowedAggregate(entries: DataFrame,
                        windowLen: String = "1 minute",
                        watermarkDelay: String = "5 minutes"): DataFrame =
    detailed(entries)
      .filter(col("event_time").isNotNull)
      .withWatermark("event_time", watermarkDelay)
      .groupBy(
        window(col("event_time"), windowLen),
        col("Normalized_Query"))
      .agg(
        count(lit(1)).as("Executions"),
        min(col("Query_time (ms)")).as("Min_Query_time_ms"),
        max(col("Query_time (ms)")).as("Max_Query_time_ms"),
        round(avg(col("Query_time (ms)")), 2).as("Avg_Query_time_ms"),
        min_by(col("Query"), col("event_time")).as("Sample_Query"))
}
