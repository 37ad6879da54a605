package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Verify <sfDir> <outDir> [query...]")
    val (sfDir, outDir) = (args(0), args(1))
    // optional trailing query names: dump only that subset (dev loop —
    // the driver always passes exactly two args and gets the full dump)
    val subset = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", GraftExtensions.Name)
      // Kryo: see Bench — the serialized stage pins need it
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
    // StageCache pin-level A/B knob (same as Bench/BenchOne) — lets the
    // oracle gate run under a non-default pin mode (e.g. PARQUET)
    sys.env.get("SPARK_GRAFT_STAGE_LEVEL").foreach(
      builder.config(graft.engine.StageCache.StorageLevelConf, _))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.engine.ingest.Sources.ensureNanosAsLong(spark)
    new java.io.File(outDir).mkdirs()
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => subset.isEmpty || subset(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // A query that errors must be a VISIBLE failure, not a silent omission
    // from the dump (a dropped dump dir just vanishes from the driver's
    // compare). Always write the error manifest — empty {} is the green
    // signal — and scream a summary line the driver's log captures.
    val errJson = failed.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"), errJson)
    if (failed.nonEmpty)
      System.err.println(
        s"[verify] FAILED ${failed.size} queries (see verify_errors.json): " +
          failed.keys.mkString(", "))
    // Exit 0 even on per-query failures: the driver must still compare the
    // queries that DID dump (a non-zero rc could zero the whole round).
    // The manifest + stderr line are the failure signal.
    spark.stop()
  }
}
