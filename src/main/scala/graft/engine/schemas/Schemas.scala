package graft.engine.schemas

import org.apache.spark.sql.types._

/** Static schemas — the reference's hardcoded column lists
  * (mongo_parser.py:18-20, mysqlLogParser.py:104-113) become declared
  * StructTypes, the single source of truth for output shapes.
  */
object Schemas {

  /** Input schema for a mongod ≥4.4 structured log line (SURVEY.md §1.2).
    * Known scalars are typed; the open-shaped `attr.command` document is NOT
    * in the schema — it is extracted as a raw JSON substring with
    * get_json_object so no information is lost. `_corrupt` captures invalid
    * JSON under PERMISSIVE mode (the E1 bad-record channel).
    */
  val CorruptField = "_corrupt"

  val MongodLine: StructType = StructType(Seq(
    StructField("t", StructType(Seq(StructField("$date", StringType)))),
    StructField("s", StringType),
    StructField("c", StringType),
    StructField("id", LongType),
    StructField("ctx", StringType),
    StructField("msg", StringType),
    StructField("attr", StructType(Seq(
      StructField("type", StringType),
      StructField("ns", StringType),
      StructField("planSummary", StringType),
      StructField("keysExamined", LongType),
      StructField("docsExamined", LongType),
      StructField("numYields", LongType),
      StructField("nreturned", LongType),
      StructField("durationMillis", LongType),
      StructField("error", StructType(Seq(
        StructField("code", LongType),
        StructField("codeName", StringType),
        StructField("errmsg", StringType))))))),
    StructField(CorruptField, StringType)))

  // Typed views for Dataset[T] use in tests.
  final case class SlowQuery(
      Command: String, Collection: String, AppName: String,
      `Duration(ms)`: Long, KeysExamined: Long, DocsExamined: Long,
      numYields: Long, nreturned: Long, Filter: String, Plan: String,
      timestamp: String)

  final case class ErrorStat(
      OriginalLineNumber: Long, msg: String, error: String, errmsg: String,
      totalCount: Long, SampleLine: String)

  final case class MySqlEntry(
      Time: String, `User@Host`: String, `Query_time (ms)`: Double,
      Lock_time: String, Rows_sent: String, Rows_examined: String,
      Query: String, Normalized_Query: String)
}
