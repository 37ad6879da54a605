package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Co-located joins via bucketing: writing both join sides bucketed on the
  * join key lets Spark plan a sort-merge join with NO shuffle exchange —
  * the layout a 100 TB deployment pre-pays once at ingest so every
  * subsequent fact-fact join skips the repartition entirely
  * (SURVEY.md §4 / README "Design for scale").
  */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed fact-fact join plans without a shuffle and matches unbucketed") {
    val sf = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice")
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_orderstatus")

    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_b")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_b")

    def joined(l: org.apache.spark.sql.DataFrame, o: org.apache.spark.sql.DataFrame) =
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("rev_c"))
        .orderBy(col("o_orderstatus"))

    val bucketed = joined(spark.table("li_b"), spark.table("ord_b"))
    // the join itself must not shuffle: the only exchanges allowed are the
    // post-aggregation ones (groupBy/orderBy), which consume far fewer rows
    val plan = bucketed.queryExecution.executedPlan
    val shufflesBeforeAgg = plan.collect {
      case s: ShuffleExchangeExec
        if s.find(_.isInstanceOf[
          org.apache.spark.sql.execution.joins.SortMergeJoinExec]).isDefined => s
    }
    assert(shufflesBeforeAgg.isEmpty,
      s"join inputs were shuffled:\n$plan")

    val expected = joined(li, ord).collect().toSeq
    assert(bucketed.collect().toSeq === expected)
  }
}
