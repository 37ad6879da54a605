package graft

import graft.engine.ingest.Sources
import graft.engine.mongo.MongoLogPipeline
import graft.engine.mysql.MySqlLogPipeline
import graft.engine.report.Views

/** SQL-front-end test: pipeline outputs are queryable and composable via
  * spark.sql after registration.
  */
class ViewsSpec extends SparkTestBase {

  test("spark.sql works over registered mongo views, filters compose") {
    val res = MongoLogPipeline.analyze(Sources.fromLines(spark, Seq(
      """{"t":{"$date":"2023-10-25T10:00:00.000Z"},"s":"I","c":"COMMAND","id":1,"ctx":"c","msg":"Slow query","attr":{"ns":"db.users","command":{"find":"users","filter":{"a":1}},"durationMillis":120}}""",
      """{"t":{"$date":"2023-10-25T10:00:01.000Z"},"s":"I","c":"COMMAND","id":1,"ctx":"c","msg":"Slow query","attr":{"ns":"db.carts","command":{"find":"carts","filter":{"b":2}},"durationMillis":80}}""",
    )))
    Views.registerMongo(res, "vm")
    val rows = spark.sql(
      """SELECT Collection, `Duration(ms)` FROM vm_detailed
        |WHERE `Duration(ms)` > 100 ORDER BY Collection""".stripMargin).collect()
    assert(rows.length === 1)
    assert(rows(0).getString(0) === "users")
    assert(spark.sql("SELECT count(*) FROM vm_query_stats").head().getLong(0) === 2L)
  }

  test("spark.sql works over registered mysql views") {
    val log =
      """# Time: 231026 10:00:01
        |# User@Host: a[a] @ h [ip] thread_id: 1
        |# Query_time: 2.0 Lock_time: 0.0 Rows_sent: 1 Rows_examined: 1
        |SET timestamp=1;
        |SELECT * FROM t WHERE id = 5;
        |""".stripMargin
    Views.registerMySql(
      MySqlLogPipeline.parse(Sources.fromContent(spark, log)), "vq")
    val r = spark.sql(
      "SELECT Normalized_Query, `Query_time (ms)` FROM vq_detailed").head()
    assert(r.getString(0) === "SELECT * FROM T WHERE ID = ?;")
    assert(r.getDouble(1) === 2000.0)
  }
}
