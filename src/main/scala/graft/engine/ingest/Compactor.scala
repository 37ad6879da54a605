package graft.engine.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-files compaction: rewrite a parquet directory into files of
  * roughly `targetBytes` each.
  *
  * The small-files problem is the dominant operational failure mode of a
  * long-lived 100 TB lake: streaming micro-batches and over-partitioned
  * writes leave millions of KB-scale files, and every downstream scan
  * pays per-file open cost plus a driver-side listing that grows without
  * bound. Compaction is the maintenance pass that restores
  * scan-efficiency; file count is computed from the INPUT byte size (not
  * row counts), so the output sizing tracks the on-disk reality the
  * scheduler sees.
  */
object Compactor {

  final case class Stats(filesBefore: Long, bytesBefore: Long,
                         filesAfter: Long, rows: Long)

  private def parquetFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val out = Seq.newBuilder[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        out += ((f.getPath.toString, f.getLen))
      }
    }
    out.result()
  }

  /** Rewrite `inDir` to `outDir` as ceil(inputBytes / targetBytes) files.
    * Returns before/after stats. `sortBy` optionally clusters rows within
    * each output file so min/max row-group stats stay selective for scans
    * filtered on that column.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L << 20,
              sortBy: Option[String] = None): Stats = {
    val before = parquetFiles(spark, inDir)
    val totalBytes = before.map(_._2).sum
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inDir)
    val shaped = sortBy match {
      // repartitionByRange + in-partition sort: globally range-clustered
      // output, so a filter on the sort column prunes most files via
      // parquet row-group stats
      case Some(c) => df.repartitionByRange(nFiles, df(c))
        .sortWithinPartitions(c)
      case None => df.repartition(nFiles)
    }
    shaped.write.mode("overwrite").parquet(outDir)
    val after = parquetFiles(spark, outDir)
    Stats(before.size.toLong, totalBytes, after.size.toLong,
      spark.read.parquet(outDir).count())
  }
}
