package graft.engine.mongo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.engine.expr.Normalizers
import graft.engine.schemas.Schemas

/** MongoDB slow-query/error log analyzer as a declarative Spark dataflow
  * (reference behavior: /root/reference/Mongo/mongo_parser.py:17-131).
  *
  * One parsed scan feeds four output branches:
  *   R1 detailed slow queries  — raw-substring "Slow query" classifier (P2)
  *   A1 query-pattern stats    — F1 fingerprint groupBy, file-order sample
  *   R2 error rollup (A2)      — independent branch: a line can be both slow
  *                               and error (mongo_parser.py:31 vs :72)
  *   R3 non-slow residual      — valid JSON, not slow, not the error branch
  * plus the E1 bad-record channel for invalid JSON.
  *
  * Design for scale: the parse is a single from_json projection (one
  * WholeStageCodegen span); [[analyze]] persists it once instead of
  * re-scanning per branch; all "first in file order" semantics go through
  * the explicit line_no (min/min_by), never first().
  *
  * JSON canonical form: the engine emits command/filter JSON as the compact
  * raw substring of the input line (get_json_object). The reference
  * re-serializes through Python json.dumps, which inserts ", "/": " spacing
  * — byte-parity comparisons must normalize whitespace (SURVEY.md §2.2 P7).
  */
object MongoLogPipeline {

  val ComplexPipelineSentinel = """{"pipeline_info":"Complex pipeline, see full command"}"""

  final case class Result(detailed: DataFrame, queryStats: DataFrame,
                          nonSlow: DataFrame, errors: DataFrame,
                          parseErrors: DataFrame)

  /** Parse lines (line: String, line_no: Long) into the shared scan with
    * routing flags. Exposed for streaming reuse.
    */
  def parsedScan(lines: DataFrame): DataFrame = {
    val opts = Map("columnNameOfCorruptRecord" -> Schemas.CorruptField,
      "mode" -> "PERMISSIVE")
    lines
      .withColumn("j", from_json(col("line"), Schemas.MongodLine, opts))
      // from_json yields a NULL struct (not a corrupt record) for empty /
      // whitespace-only / literal-null input; the reference's json.loads
      // raises on those, so they must route to the parse-error channel too.
      .withColumn("valid",
        col("j").isNotNull && col(s"j.${Schemas.CorruptField}").isNull)
      .withColumn("is_slow", col("line").contains("Slow query"))
      // R2 gate (mongo_parser.py:72): msg present, s == "E", attr.error
      // present. The reference tests KEY presence; the schema-parsed
      // struct is non-null for every object-valued error (including {}),
      // differing only for `"error": null` / scalar-valued error — shapes
      // mongod does not emit. Checking the parsed struct instead of
      // get_json_object(line, ...) avoids a second full-line JSON parse
      // on EVERY line of the scan.
      .withColumn("is_error",
        col("j.msg").isNotNull && col("j.s") === "E" &&
          col("j.attr.error").isNotNull)
  }

  /** R1 + P3-P7: one row per slow-query line, reference's 11 columns plus
    * line_no provenance.
    */
  def detailed(scan: DataFrame): DataFrame = {
    // Parse the full line ONCE for the open-shaped command document; the
    // P6 sub-paths then parse only the (much smaller) command string —
    // 1 full-line JSON parse instead of 4. Materialized as a projection:
    // get_json_object is non-cheap, so CollapseProject won't re-inline it
    // into the consumers.
    val withCmd = scan.filter(col("valid") && col("is_slow"))
      .withColumn("cmd_raw", get_json_object(col("line"), "$.attr.command"))
    // P4 asymmetric defaults: missing ns splits to [""] → AppName "",
    // Collection "N/A" (mongo_parser.py:35-37).
    val nsParts = split(coalesce(col("j.attr.ns"), lit("")), "\\.", -1)
    // P6 conditional filter extraction (mongo_parser.py:44-53): presence of
    // "pipeline" wins over "filter"; a pipeline whose first stage has no
    // $match collapses to the sentinel. Missing command ⇒ null cmd_raw ⇒
    // null sub-paths ⇒ the {} fallback, same as pathing from the line.
    val filterCol =
      when(get_json_object(col("cmd_raw"), "$.pipeline").isNotNull,
        coalesce(get_json_object(col("cmd_raw"), "$.pipeline[0].$match"),
          lit(ComplexPipelineSentinel)))
        .when(get_json_object(col("cmd_raw"), "$.filter").isNotNull,
          get_json_object(col("cmd_raw"), "$.filter"))
        .otherwise(lit("{}"))

    withCmd.select(
      col("line_no"),
      coalesce(col("cmd_raw"), lit("{}")).as("Command"),
      when(size(nsParts) > 1, element_at(nsParts, 2)).otherwise("N/A").as("Collection"),
      element_at(nsParts, 1).as("AppName"),
      coalesce(col("j.attr.durationMillis"), lit(0L)).as("Duration(ms)"),
      coalesce(col("j.attr.keysExamined"), lit(0L)).as("KeysExamined"),
      coalesce(col("j.attr.docsExamined"), lit(0L)).as("DocsExamined"),
      coalesce(col("j.attr.numYields"), lit(0L)).as("numYields"),
      coalesce(col("j.attr.nreturned"), lit(0L)).as("nreturned"),
      filterCol.as("Filter"),
      coalesce(col("j.attr.planSummary"), lit("")).as("Plan"),
      coalesce(col("j.t.`$date`"), lit("")).as("timestamp"))
  }

  /** A1 + O1: stats per F1-normalized pattern, sorted by Executions desc
    * then Avg desc (mongo_parser.py:113-129).
    */
  def queryStats(detailedDf: DataFrame): DataFrame =
    detailedDf
      .groupBy(Normalizers.normalizeMongoQuery(col("Command")).as("Query Pattern"))
      .agg(
        count(lit(1)).as("Executions"),
        min(col("Duration(ms)")).as("Min Duration(ms)"),
        max(col("Duration(ms)")).as("Max Duration(ms)"),
        round(avg(col("Duration(ms)")), 2).as("Avg Duration(ms)"),
        min_by(col("Command"), col("line_no")).as("Sample Full Query"))
      .orderBy(desc("Executions"), desc("Avg Duration(ms)"))

  /** A2: error rollup grouped on (msg, codeName, errmsg) — equivalent to the
    * reference's "msg|codeName|errmsg" composite key (F4) but skew- and
    * collision-safe. First-seen line number and sample via min/min_by.
    */
  def errors(scan: DataFrame): DataFrame =
    scan.filter(col("valid") && col("is_error"))
      .groupBy(
        col("j.msg").as("msg"),
        coalesce(col("j.attr.error.codeName"), lit("N/A")).as("error"),
        coalesce(col("j.attr.error.errmsg"), lit("N/A")).as("errmsg"))
      .agg(
        min(col("line_no")).as("OriginalLineNumber"),
        count(lit(1)).as("totalCount"),
        min_by(Normalizers.pyStrip(col("line")), col("line_no")).as("SampleLine"))
      .select("OriginalLineNumber", "msg", "error", "errmsg", "totalCount", "SampleLine")
      .orderBy(col("OriginalLineNumber")) // == reference insertion order

  /** R3: valid JSON, not slow, and not claimed by the error branch
    * (the reference's elif at mongo_parser.py:88).
    */
  def nonSlow(scan: DataFrame): DataFrame =
    scan.filter(col("valid") && !col("is_slow") && !col("is_error"))
      .select(col("line_no"), Normalizers.pyStrip(col("line")).as("LogLine"))

  /** E1: bad-record channel with the reference's message format
    * (mongo_parser.py:91-94).
    */
  def parseErrors(scan: DataFrame): DataFrame =
    scan.filter(!col("valid"))
      .select(col("line_no"),
        concat(lit("Line "), col("line_no"), lit(": Invalid JSON. Skipped."))
          .as("message"))

  /** Full run: one persisted scan, four branches + bad-record channel.
    * Caller unpersists via [[Result]] usage lifetime (or spark context end).
    */
  def analyze(lines: DataFrame): Result = {
    val scan = parsedScan(lines).persist(StorageLevel.MEMORY_AND_DISK)
    val det = detailed(scan)
    Result(det, queryStats(det), nonSlow(scan), errors(scan), parseErrors(scan))
  }
}
