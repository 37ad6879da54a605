package graft

import org.apache.spark.sql.SparkSession

/** Measurement aid: dump `.explain("formatted")` for a list of registry
  * queries (or `_stage_*` rows) to files, one JVM for the whole batch.
  *
  *   runMain graft.ExplainDump <sfDir> <outDir> <suffix> <name> [name...]
  *
  * writes `<outDir>/<name>_<suffix>.txt` for each name. Session config
  * matches Bench exactly so the dumped plan is the plan the bench runs
  * (AQE initial plan — `isFinalPlan=false` — as `explain` shows before
  * execution). Used to produce the committed `plans/r16` before/after
  * artifacts; not part of the library surface.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: ExplainDump <sfDir> <outDir> <suffix> <name> [name...]")
    val sfDir = args(0)
    val outDir = new java.io.File(args(1))
    val suffix = args(2)
    val names = args.drop(3).toSeq
    outDir.mkdirs()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", GraftExtensions.Name)
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
    // StageCache pin-level knob (same as Bench/BenchOne/Verify) — lets a
    // CONSUMER dump show what its scan of the pin looks like under a
    // given pin mode (e.g. FileSourceScan w/ pruned ReadSchema vs a
    // whole-row Scan ExistingRDD)
    sys.env.get("SPARK_GRAFT_STAGE_LEVEL").foreach(
      builder.config(graft.engine.StageCache.StorageLevelConf, _))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.ingest.Sources.ensureNanosAsLong(spark)
    try SparkEntry.prepare(spark, sfDir) catch { case _: Throwable => () }
    names.foreach { name =>
      val fn =
        if (name.startsWith("_stage_"))
          BenchStages.rows.collectFirst { case (`name`, f) => f }
        else SparkEntry.queries.get(name)
      fn match {
        case None =>
          // tolerated, not fatal: the same name list is replayed against
          // older shas where a row may not exist yet (its "before" is the
          // consumer queries' plans)
          println(s"[explain] SKIP $name (not in this sha's registry)")
        case Some(f0) =>
          // `_stage_*` rows: show the BUILD plan, not a scan of the pin
          // the cache would otherwise eagerly materialize
          spark.conf.set(graft.engine.StageCache.PassthroughConf,
            name.startsWith("_stage_").toString)
          val plan = f0(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val f = new java.io.File(outDir, s"${name}_$suffix.txt")
          val w = new java.io.PrintWriter(f, "UTF-8")
          try w.print(plan) finally w.close()
          println(s"[explain] wrote ${f.getPath} (${plan.length} chars)")
      }
    }
    spark.stop()
  }
}
