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

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    spark.read.parquet(s"$sf/documents.parquet")
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    // dim carries the selective filter; the fact is only joined on the
    // partition column — pruning must come from the join at RUNTIME.
    // The dim must be a real relation (parquet, not a LocalRelation): a
    // local table constant-folds the filter away and the pruning rule
    // sees no selective predicate to propagate.
    val dimPath = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString
    Seq(("en", "keep"), ("de", "drop"), ("fr", "drop"))
      .toDF("lang", "verdict").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("verdict") === "keep")
    val q = spark.read.parquet(out).join(dim, "lang")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no DynamicPruningExpression in the fact scan:\n${plan.take(1200)}")
    assert(q.count() > 0)
  }

  test("zValue interleaves bits exactly (Morton order)") {
    import graft.engine.ingest.Layout
    import spark.implicits._
    val rows = Seq((1L, 0L), (0L, 1L), (3L, 3L), (65535L, 65535L),
      (5L, 2L), (70000L, 0L)) // 70000 exercises the 16-bit mask
    val got = rows.toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    def ref(x: Long, y: Long): Long =
      (0 until 16).map(i =>
        ((((x & 65535) >> i) & 1) << (2 * i)) |
          ((((y & 65535) >> i) & 1) << (2 * i + 1))).sum
    assert(got === rows.map { case (x, y) => ref(x, y) })
    assert(got(0) === 1L && got(1) === 2L && got(2) === 15L &&
      got(3) === 0xFFFFFFFFL)
  }

  test("zorder clustering yields narrow per-file spans in BOTH dimensions") {
    import graft.engine.ingest.Layout
    // a 64×64 grid: any single-column range sort would give y-spans of 63
    // in every file; z-order bounds both spans per range bucket
    val grid = spark.range(0, 64L * 64)
      .select((col("id") / 64).cast("long").as("x"),
        (col("id") % 64).cast("long").as("y"))
    val parts = 16
    val laid = Layout.zorder(grid, col("x"), col("y"), parts)
    val spans = laid
      .select(org.apache.spark.sql.functions.spark_partition_id().as("p"),
        col("x"), col("y"))
      .groupBy(col("p"))
      .agg((max(col("x")) - min(col("x"))).as("xs"),
        (max(col("y")) - min(col("y"))).as("ys"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(spans.length === parts)
    // perfect z-split of a 64×64 grid into 16 equal ranges gives 16×16
    // tiles; range-boundary sampling can merge two neighbors — allow 2×
    // slack, still far under the 63 a 1-D sort gives every file
    assert(spans.forall { case (xs, ys) => xs <= 32 && ys <= 32 },
      spans.mkString(","))
  }
}
