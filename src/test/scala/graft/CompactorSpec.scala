package graft

import org.apache.spark.sql.functions._
import graft.engine.ingest.Compactor

class CompactorSpec extends SparkTestBase {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("compaction collapses a fragmented directory, content-identical") {
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val frag = tmp("graft-frag")
    src.repartition(20).write.mode("overwrite").parquet(frag)

    val out = tmp("graft-compact")
    // target ≥ total input bytes → a single output file
    val stats = Compactor.compact(spark, frag, out, targetBytes = 1L << 30)
    assert(stats.filesBefore === 20L)
    assert(stats.filesAfter === 1L)
    assert(stats.rows === src.count())
    // content identical, not just counted
    val a = spark.read.parquet(out).orderBy("doc_id").collect().toSeq
    val b = src.orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("range-clustered compaction keeps scans selective") {
    val src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val frag = tmp("graft-frag-li")
    src.repartition(16).write.mode("overwrite").parquet(frag)

    val out = tmp("graft-compact-li")
    val stats = Compactor.compact(spark, frag, out,
      targetBytes = stats0(frag) / 4 + 1, sortBy = Some("l_orderkey"))
    assert(stats.filesAfter < stats.filesBefore)
    assert(stats.rows === src.count())
    // range clustering: each output file covers a disjoint key span, so
    // one key's rows live in exactly one file
    val files = spark.read.parquet(out)
      .select(input_file_name().as("f"), col("l_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(countDistinct(col("f")).as("nf"))
      .agg(max(col("nf")).as("m")).first().getLong(0)
    assert(files === 1L)
  }

  private def stats0(dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0L
    while (it.hasNext) { val f = it.next(); if (f.getPath.getName.endsWith(".parquet")) n += f.getLen }
    n
  }
}
