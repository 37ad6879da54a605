package graft.engine.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) curve clustering.
  *
  * A table range-partitioned on ONE column prunes scans only on that
  * column; interleaving the bits of two key columns into a single Z-value
  * and range-partitioning on THAT gives every file a narrow range in BOTH
  * dimensions — the standard layout trick (Delta/Iceberg `ZORDER BY`) for
  * making min/max file statistics prune two-dimensional predicates at
  * 100 TB. Companion to [[Compactor]] (which fixes file sizes; this fixes
  * file contents).
  *
  * The interleave is a fixed 16-bit × 2 bit-weave in pure integer
  * arithmetic — the same closed-form expression runs in any engine, so an
  * oracle can replay it bit-for-bit.
  */
object Layout {

  /** Bits kept per dimension (Z-value spans 2·Bits = 32 bits). */
  val Bits = 16

  private def mask(c: Column): Column = c.bitwiseAND(lit((1L << Bits) - 1))

  /** Morton interleave of the low [[Bits]] bits of x (even positions) and
    * y (odd positions): one flat 32-term integer sum, fully codegen'd.
    */
  def zValue(x: Column, y: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftright(mask(x), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(mask(y), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** The same interleave as ANSI SQL text (for oracles / other engines).
    * Disjoint bit positions make `+` equal to `|`; every term is fully
    * parenthesized so shift/and precedence can't differ across dialects.
    */
  def zValueSql(x: String, y: String): String =
    (0 until Bits).map { i =>
      s"(((($x & 65535) >> $i) & 1) << ${2 * i}) + " +
        s"(((($y & 65535) >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  /** Cluster `df` for writing: range-partition by the Z-value of (x, y)
    * so each output file covers a small Z-range — i.e. a small rectangle
    * in (x, y) space. `repartitionByRange` samples the Z distribution, so
    * skewed keys still yield balanced files.
    */
  def zorder(df: DataFrame, x: Column, y: Column, partitions: Int): DataFrame =
    df.withColumn("z", zValue(x, y)).repartitionByRange(partitions, col("z"))

  /** Layout-quality diagnostic over `lineitem`: bucket rows by the top
    * bits of z(l_partkey, l_suppkey) — each bucket is what one output
    * file would hold under [[zorder]] — and report the per-bucket min/max
    * span of BOTH dimensions. Narrow spans = min/max file stats prune
    * either predicate; compare with a single-column sort where the
    * second dimension's span is the full domain. One shuffle (the
    * groupBy); the Z-value itself is a pure projection.
    */
  def zorderStats(spark: SparkSession, dir: String, bucketShift: Int = 16): DataFrame = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    li.select(col("l_partkey").cast("long").as("x"),
        col("l_suppkey").cast("long").as("y"))
      .withColumn("z", zValue(col("x"), col("y")))
      .groupBy(shiftright(col("z"), bucketShift).as("z_bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
      .withColumn("x_span", col("x_max") - col("x_min"))
      .withColumn("y_span", col("y_max") - col("y_min"))
      .orderBy(col("z_bucket"))
  }
}
