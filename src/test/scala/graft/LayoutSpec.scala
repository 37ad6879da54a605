package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** Data-layout scale proofs: the scan-side behaviors that decide whether a
  * 100 TB query reads 100 TB or just its slice.
  */
class LayoutSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan"))

  test("hive-partitioned layout prunes partitions at planning time") {
    val out = java.nio.file.Files.createTempDirectory("graft-layout").toString
    spark.read.parquet(s"$sf/documents.parquet")
      .write.mode("overwrite").partitionBy("lang").parquet(out)

    val q = spark.read.parquet(out).filter(col("lang") === "en")
    val scan = scanOf(q)
    // listed directories must already be only lang=en — the filter never
    // touches the other languages' files
    val parts = scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters)
    assert(parts.nonEmpty)
    assert(parts.forall(_.values.toSeq(Seq(org.apache.spark.sql.types.StringType))
      .head.toString == "en"),
      s"non-en partition survived pruning: $parts")
    val total = spark.read.parquet(out)
    assert(q.count() > 0 && q.count() < total.count())
  }

  test("predicate and projection reach the parquet scan") {
    val q = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_quantity") >= 49)
      .select(col("l_orderkey"), col("l_quantity"))
    val scan = scanOf(q)
    // filter pushed to the reader
    assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual(l_quantity"),
      scan.metadata("PushedFilters"))
    // column pruning: the scan schema is the 2 referenced columns, not all 16
    assert(scan.requiredSchema.fieldNames.toSet ===
      Set("l_orderkey", "l_quantity"), scan.requiredSchema.treeString)
  }
}
