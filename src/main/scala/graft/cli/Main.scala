package graft.cli

import org.apache.spark.sql.SparkSession
import graft.engine.ingest.Sources
import graft.engine.mongo.MongoLogPipeline
import graft.engine.mysql.MySqlLogPipeline
import graft.engine.report.{HtmlWriter, ReportSink, XlsxWriter}
import org.apache.spark.sql.DataFrame

/** CLI entry point — the Spark-native equivalent of the reference's
  * argparse mains (mongo_parser.py:196-251, mysqlLogParser.py:199-251).
  *
  * Usage:
  *   graft.cli.Main --mode mongo|mysql --input <log path/glob>
  *                  --output <report dir> [--csv] [--scale] [--xlsx]
  *                  [--html]
  *   graft.cli.Main --mode query --query <registry name>
  *                  --input <sf table dir> --output <result dir> [--csv]
  *
  * --mode query runs ANY registered operator from [[graft.SparkEntry]]
  * (all 180+ dedup / ANN / corpus / text / event queries) against a
  * table directory and writes the result as parquet (plus CSV with
  * --csv) — the whole library as a command-line tool, not just the two
  * reference parsers. `--query list` prints the registry.
  *
  * --scale selects the 100 TB-shaped source for MySQL (record-delimited
  * parallel read) instead of the reference-parity whole-file read.
  * --xlsx additionally assembles `<output>/report.xlsx`, a real OOXML
  * workbook with the reference's sheet names (mongo_parser.py:136-141,
  * mysqlLogParser.py:139-142) — the download a reference user expects.
  * --html additionally renders `<output>/report.html`, a self-contained
  * serve-less page with the same sheets — the K3 interactive-UI analog
  * (mongo_parser.py:146-192).
  */
object Main {

  private case class Args(mode: String = "", input: String = "",
                          output: String = "", csv: Boolean = false,
                          scale: Boolean = false, xlsx: Boolean = false,
                          html: Boolean = false, query: String = "",
                          stageCacheDir: String = "")

  private def parseArgs(argv: List[String], a: Args = Args()): Args = argv match {
    case "--mode" :: v :: rest   => parseArgs(rest, a.copy(mode = v))
    case "--input" :: v :: rest  => parseArgs(rest, a.copy(input = v))
    case "--output" :: v :: rest => parseArgs(rest, a.copy(output = v))
    case "--query" :: v :: rest  => parseArgs(rest, a.copy(query = v))
    case "--csv" :: rest         => parseArgs(rest, a.copy(csv = true))
    case "--scale" :: rest       => parseArgs(rest, a.copy(scale = true))
    case "--xlsx" :: rest        => parseArgs(rest, a.copy(xlsx = true))
    case "--html" :: rest        => parseArgs(rest, a.copy(html = true))
    // durable StageCache (spark.graft.stageCache.dir): shared-stage
    // queries materialize to parquet under this dir and REUSE it across
    // runs — the cluster/cron deployment mode, where a localCheckpoint
    // would die with the session
    case "--stage-cache-dir" :: v :: rest =>
      parseArgs(rest, a.copy(stageCacheDir = v))
    case Nil                     => a
    case other :: _ => sys.error(s"Unknown argument: $other")
  }

  /** Distributed per-sheet dirs always; the workbook only on request
    * (a driver-side collect, same as the reference's pandas assembly).
    */
  private def writeReport(outDir: String, sheets: Seq[(String, DataFrame)],
                          csv: Boolean, xlsx: Boolean,
                          html: Boolean): (Boolean, String) = {
    var r = ReportSink.writeSheets(outDir, sheets, csv)
    if (r._1 && xlsx)
      r = try { XlsxWriter.write(s"$outDir/report.xlsx", sheets); r }
        catch { case e: Exception => (false, s"Error writing report: ${e.getMessage}") }
    if (r._1 && html)
      r = try { HtmlWriter.write(s"$outDir/report.html", "Log Report", sheets); r }
        catch { case e: Exception => (false, s"Error writing report: ${e.getMessage}") }
    r
  }

  def main(argv: Array[String]): Unit = {
    val args = parseArgs(argv.toList)
    require(Set("mongo", "mysql", "query")(args.mode),
      "--mode must be mongo, mysql or query")
    if (args.mode == "query" && args.query == "list") {
      graft.SparkEntry.queries.keys.toSeq.sorted.foreach(println)
      return
    }
    require(args.input.nonEmpty && args.output.nonEmpty,
      "--input and --output are required")

    val preexisting = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isDefined
    val builder = SparkSession.builder()
      .appName(s"graft-${args.mode}")
      .config("spark.sql.session.timeZone", "UTC")
      // Kryo: the StageCache serialized pins pay ObjectOutputStream per
      // row otherwise (QUERIES.md §"Stage pin storage"). spark.serializer
      // is a static core conf: an embedding caller's or spark-submit's
      // RUNNING context keeps whatever it launched with — this only
      // takes effect when this CLI is the one creating the context
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      // lz4 the serialized pins: the DISK_ONLY stage materializations
      // write multi-GB long/string tables whose blocks shrink 2-4x
      // under lz4 — on hosts where disk bandwidth is the pin
      // bottleneck the compressed write+read is the difference between
      // a usable and an unusable stage build (r16 session-3 A/B,
      // QUERIES.md §"Stage pin storage"). Same static-conf caveat as
      // spark.serializer above.
      .config("spark.rdd.compress", "true")
      .config("spark.sql.extensions", graft.GraftExtensions.Name)
    // under spark-submit (or an embedding test session) the master is
    // already set; a bare `java`/`sbt runMain` invocation gets local[*]
    val spark = (if (preexisting || sys.props.contains("spark.master")) builder
                 else builder.master("local[*]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.engine.ingest.Sources.ensureNanosAsLong(spark)
    if (args.stageCacheDir.nonEmpty)
      spark.conf.set(graft.engine.StageCache.DurableDirConf, args.stageCacheDir)

    val (ok, err) = args.mode match {
      case "query" =>
        graft.SparkEntry.queries.get(args.query) match {
          case None =>
            (false, s"Unknown query '${args.query}' — use --query list")
          case Some(fn) =>
            try {
              // log-family queries (mysql_*, mongo_*) read generated
              // fixture files; prepare writes them exactly as Bench does
              try graft.SparkEntry.prepare(spark, args.input)
              catch { case _: Throwable => () }
              val df = fn(spark, args.input)
              df.write.mode("overwrite").parquet(s"${args.output}/result")
              if (args.csv)
                // CSV from the result just written — never re-execute
                // the (possibly expensive) query lineage a second time
                spark.read.parquet(s"${args.output}/result")
                  .coalesce(1).write.mode("overwrite")
                  .option("header", "true").csv(s"${args.output}/result_csv")
              (true, "")
            } catch {
              case e: Exception => (false, s"Query failed: ${e.getMessage}")
            }
        }
      case "mongo" =>
        val lines = Sources.readLines(spark, args.input)
        val res = MongoLogPipeline.analyze(lines)
        // S4 empty-input guard: the reference checks the RAW line list
        // (mongo_parser.py:218-222), not the parsed outputs — an input of
        // only error lines must NOT warn.
        if (lines.isEmpty) println("Warning: Input file is empty.")
        val nErr = res.parseErrors.count()
        if (nErr > 0) println(s"Encountered $nErr parse warning(s).")
        ReportSink.writeWarnings(args.output, res.parseErrors, "message")
        writeReport(args.output, ReportSink.MongoSheets.zip(Seq(
          res.detailed, res.queryStats, res.nonSlow, res.errors)),
          args.csv, args.xlsx, args.html)
      case "mysql" =>
        val entries =
          if (args.scale) Sources.readDelimited(spark, args.input)
            .selectExpr("cast(0 as long) as file_id", "entry_no",
              "entry_no as ord", "entry")
          else MySqlLogPipeline.entriesFromFiles(
            Sources.readWholeFile(spark, args.input))
        val res = MySqlLogPipeline.parseEntries(entries)
        if (res.detailed.isEmpty)
          println("Warning: No valid log entries found in the input.")
        val nWarn = res.warnings.count()
        if (nWarn > 0) println(s"Encountered $nWarn parse warning(s).")
        ReportSink.writeWarnings(args.output, res.warnings)
        writeReport(args.output, ReportSink.MySqlSheets.zip(Seq(
          MySqlLogPipeline.referenceDetailed(res.detailed), res.aggregate)),
          args.csv, args.xlsx, args.html)
    }
    if (ok) println(s"Report written to ${args.output}")
    else { System.err.println(err); sys.exit(1) }
    if (!preexisting) spark.stop() // embedded callers (tests) own their session
  }
}
