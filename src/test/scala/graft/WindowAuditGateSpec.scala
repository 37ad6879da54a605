package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The unpartitioned-window audit as a FAILING GATE (r10 verdict ask
  * #3): `graft.WindowAudit` ran once and committed its JSON, but nothing
  * stopped a future query from re-introducing a data-sized global
  * window. This spec executes the WHOLE registry at the sf0.001 fixture
  * and fails the build if any query's unpartitioned window measures more
  * input rows than the gate — the same executed-plan-metrics technique
  * as the main (including its must-execute-own-toRdd pitfall, which
  * [[WindowAudit.auditQuery]] encapsulates), so the committed artifact
  * and the gate can never diverge. A deliberately-injected global ntile
  * proves the gate actually trips (the cartesian sweep's negative-test
  * pattern).
  */
class WindowAuditGateSpec extends SparkTestBase {

  /** Same gate as the committed artifact: an order of magnitude above
    * every legitimate census, an order below the smallest data grain. */
  private val Gate = 4096L

  test("no registered query exceeds the global-window gate (full registry, sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.prepare(spark, dir)
    val offenders = scala.collection.mutable.Buffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val detail =
        try WindowAudit.auditQuery(fn(spark, dir))
        catch { case e: Throwable =>
          fail(s"$name failed to execute under the window audit: $e")
        }
      detail.filter(_._2 > Gate).foreach { case (order, rows) =>
        offenders += s"$name: window over ($order) measured $rows rows"
      }
    }
    assert(offenders.isEmpty,
      s"data-sized unpartitioned window(s):\n${offenders.mkString("\n")}")
  }

  test("a deliberately-injected global ntile TRIPS the gate (negative test)") {
    // 5000 rows through ntile().over(Window.orderBy(...)) — the exact
    // single-partition shape the engine banned; the audit must measure
    // it above the gate, proving the positive test can actually fail
    val bad = spark.range(5000).toDF("id")
      .withColumn("nt", ntile(10).over(Window.orderBy(col("id"))))
    val detail = WindowAudit.auditQuery(bad)
    assert(detail.nonEmpty, "audit missed the global window entirely")
    assert(detail.map(_._2).max > Gate,
      s"audit under-measured the injected window: $detail")
  }
}
