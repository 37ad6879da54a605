package graft.engine.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic log generation from the driver-provided testdata
  * tables (TESTDATA.md). This lets every log-pipeline correctness query run
  * against inputs that a DuckDB oracle can reconstruct analytically from the
  * same parquet — the oracle predicts the pipeline's output from the
  * generation parameters while Spark exercises the real parse path
  * (split/regex/from_json), so a green compare proves the parse.
  *
  * All embedded values are integers (epoch-micros timestamps, modular
  * counters) so string rendering is bit-identical across Spark and DuckDB.
  */
object LogGen {

  private def s(c: Column): Column = c.cast("string")

  /** Epoch-micros of a TIMESTAMP_NTZ column (the testdata parquet has no
    * timezone). NTZ→TZ cast interprets wall time in the session timezone,
    * which every entry point pins to UTC — matching DuckDB's epoch_us on the
    * same naive timestamps.
    */
  private def microsNtz(c: Column): Column = unix_micros(c.cast("timestamp"))

  // ---------------------------------------------------------------- MySQL

  /** One slow-log entry per `orders` row, keyed by o_orderkey:
    *  - key % 53 == 0  → broken User@Host line ("thread-id:") → gate-skipped
    *  - key % 97 == 0  → unparsable Query_time ("bad") → 0.0 + warning
    *  - key % 5 picks the query template (template 4 = empty query)
    * Entry text layout mirrors a Percona slow log.
    */
  def mysqlEntry(key: Column, custkey: Column, orderdate: Column): Column = {
    val m = key % 5
    val tbl = element_at(array(lit("orders"), lit("customer"), lit("part")),
      (key % 3 + 1).cast("int"))
    val query = when(m === 0,
        concat(lit("SELECT * FROM "), tbl, lit(" WHERE id = "), s(key), lit(";")))
      .when(m === 1,
        concat(lit("SELECT c_name FROM customer WHERE c_custkey = "),
          s(custkey % 1500), lit(" AND c_mktsegment = 'SEG"), s(key % 5),
          lit("' AND c_acctbal > 19.99;")))
      .when(m === 2,
        concat(lit("UPDATE orders SET o_orderstatus = 'S' WHERE o_orderkey = "),
          s(key), lit("; -- retry "), s(key % 4)))
      .when(m === 3,
        concat(lit("SELECT o1.o_orderkey,\n  o1.o_totalprice\nFROM orders o1\nWHERE o1.o_custkey = "),
          s(custkey % 1500), lit(" LIMIT 10;")))
      .otherwise(lit(""))

    val uhLine = when(key % 53 === 0,
        // broken marker: user_host_pattern requires " thread_id:"
        concat(lit("# User@Host: user"), s(custkey % 20), lit("[u] @ host"),
          s(custkey % 7), lit(" [10.0.0."), s(custkey % 7), lit("] thread-id: "),
          s(custkey % 50)))
      .otherwise(
        concat(lit("# User@Host: user"), s(custkey % 20), lit("[u] @ host"),
          s(custkey % 7), lit(" [10.0.0."), s(custkey % 7), lit("] thread_id: "),
          s(custkey % 50)))

    val qt = when(key % 97 === 0, lit("bad")).otherwise(s(key % 7))

    concat(
      lit("# Time: "), s(microsNtz(orderdate)),
      lit("\n"), uhLine,
      lit("\n# Query_time: "), qt,
      lit(" Lock_time: 0.00"), s(key % 10),
      lit(" Rows_sent: "), s(key % 100),
      lit(" Rows_examined: "), s(key % 1000),
      lit("\nSET timestamp="), s(key + lit(1700000000L)), lit(";\n"),
      when(m === 4, lit("")).otherwise(concat(query, lit("\n"))))
  }

  /** Whole-log content rows: (file_id, content), one file per 1000 orders,
    * entries concatenated in o_orderkey order. The ordered concat goes
    * through collect_list(struct)+array_sort, not ordering assumptions on
    * the shuffle — deterministic on any cluster layout.
    */
  def mysqlFiles(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    orders
      .select((col("o_orderkey") / 1000).cast("long").as("file_id"),
        struct(col("o_orderkey"),
          mysqlEntry(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
            .as("entry")).as("rec"))
      .groupBy(col("file_id"))
      .agg(array_join(transform(array_sort(collect_list(col("rec"))),
        r => r.getField("entry")), "").as("content"))
  }

  // ---------------------------------------------------------------- Mongo

  /** One mongod structured-log line per `events` row (line_no = event_id+1):
    *  - click                → "Slow query" find command
    *  - purchase (even/odd)  → "Slow query" aggregate with $match / complex
    *  - error                → s:"E" error line; event_id%4==0 variant has
    *                           msg "Slow query" (dual-routed line)
    *  - view                 → event_id%7 picks: 4 shape-malformed "Slow
    *                           query" classes that raise generic exceptions
    *                           in the reference (scalar t / string attr /
    *                           numeric ns / scalar command), a non-slow
    *                           scalar-t line (salvaged to non_slow), or
    *                           plain connection noise
    *  - signup               → invalid JSON when event_id%3==0, else
    *                           non-slow auth line
    */
  def mongoLines(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.engine.ingest.Sources.events(spark, sfDir)
    val eid = col("event_id")
    val uid = col("user_id")
    val ts = s(col("ts_us"))
    val dur = s(floor(col("value") * 100).cast("long"))
    val appNs = concat(lit("app"), s(uid % 3), lit(".coll"), s(eid % 5))
    val collName = concat(lit("coll"), s(eid % 5))

    val findCmd = concat(
      lit("{\"find\":\""), collName, lit("\",\"filter\":{\"user_id\":"), s(uid),
      lit("},\"limit\":"), s(eid % 20), lit("}"))
    val aggMatchCmd = concat(
      lit("{\"aggregate\":\""), collName,
      lit("\",\"pipeline\":[{\"$match\":{\"user_id\":"), s(uid),
      lit("}},{\"$group\":{\"_id\":\"$status\",\"n\":{\"$sum\":1}}}],\"cursor\":{}}"))
    val aggComplexCmd = concat(
      lit("{\"aggregate\":\""), collName,
      lit("\",\"pipeline\":[{\"$sort\":{\"ts\":-1}},{\"$limit\":"), s(eid % 9),
      lit("}],\"cursor\":{}}"))

    val slowFind = concat(
      lit("{\"t\":{\"$date\":\""), ts, lit("\"},\"s\":\"I\",\"c\":\"COMMAND\",\"id\":51803,\"ctx\":\"conn"),
      s(uid), lit("\",\"msg\":\"Slow query\",\"attr\":{\"type\":\"command\",\"ns\":\""), appNs,
      lit("\",\"command\":"), findCmd, lit(",\"planSummary\":\"COLLSCAN\","),
      when(eid % 10 === 0, lit(""))
        .otherwise(concat(lit("\"keysExamined\":"), s(eid % 50),
          lit(",\"docsExamined\":"), s(eid % 500), lit(","))),
      lit("\"numYields\":"), s(eid % 5),
      lit(",\"nreturned\":"), s(eid % 25),
      lit(",\"durationMillis\":"), dur, lit("}}"))

    val slowAgg = concat(
      lit("{\"t\":{\"$date\":\""), ts, lit("\"},\"s\":\"I\",\"c\":\"COMMAND\",\"id\":51803,\"ctx\":\"conn"),
      s(uid), lit("\",\"msg\":\"Slow query\",\"attr\":{\"type\":\"command\",\"ns\":\""), appNs,
      lit("\",\"command\":"), when(eid % 2 === 0, aggMatchCmd).otherwise(aggComplexCmd),
      lit(",\"numYields\":"), s(eid % 5),
      lit(",\"nreturned\":"), s(eid % 25),
      lit(",\"durationMillis\":"), dur, lit("}}"))

    val errMsg = when(eid % 4 === 0, lit("Slow query"))
      .otherwise(element_at(array(lit("Connection error"),
        lit("Index build failed"), lit("Authentication failed")),
        (uid % 3 + 1).cast("int")))
    val errCode = when(eid % 4 === 0, lit("InternalError"))
      .otherwise(element_at(array(lit("HostUnreachable"),
        lit("IndexBuildAborted"), lit("AuthenticationFailed")),
        (uid % 3 + 1).cast("int")))
    val errText = when(eid % 4 === 0, lit("error while logging slow query"))
      .otherwise(element_at(array(lit("Connection refused"),
        lit("index build failed on collection"), lit("SCRAM mechanism failed")),
        (uid % 3 + 1).cast("int")))
    val errorLine = concat(
      lit("{\"t\":{\"$date\":\""), ts, lit("\"},\"s\":\"E\",\"c\":\"STORAGE\",\"id\":22435,\"ctx\":\"conn"),
      s(uid), lit("\",\"msg\":\""), errMsg,
      lit("\",\"attr\":{\"error\":{\"code\":"), s(uid % 3 + 100),
      lit(",\"codeName\":\""), errCode,
      lit("\",\"errmsg\":\""), errText, lit("\"}}}"))

    val viewNoise = concat(
      lit("{\"t\":{\"$date\":\""), ts, lit("\"},\"s\":\"I\",\"c\":\"NETWORK\",\"id\":22943,\"ctx\":\"listener\",\"msg\":\"Connection accepted\",\"attr\":{\"remote\":\"10.0.0."),
      s(uid % 255), lit(":"), s(eid % 60000),
      lit("\",\"connectionCount\":"), s(uid % 100), lit("}}"))

    // Structurally-valid JSON whose SHAPE makes the reference raise a
    // non-JSONDecodeError exception (mongo_parser.py:93-94) — the E1
    // generic message form. One class per raising access, in reference
    // evaluation order; class 4 is the non-raising counterpart (the
    // reference never touches t on the non-slow path, so the row lands in
    // non_slow despite the scalar t).
    val slowBadT = concat( // t scalar → AttributeError 'int'...'get'
      lit("{\"t\":"), s(eid),
      lit(",\"s\":\"I\",\"c\":\"COMMAND\",\"id\":51803,\"ctx\":\"conn"), s(uid),
      lit("\",\"msg\":\"Slow query\",\"attr\":{\"ns\":\""), appNs,
      lit("\",\"durationMillis\":"), dur, lit("}}"))
    val slowBadAttr = concat( // attr string → AttributeError 'str'...'get'
      lit("{\"t\":{\"$date\":\""), ts,
      lit("\"},\"s\":\"I\",\"c\":\"COMMAND\",\"id\":51803,\"ctx\":\"conn"), s(uid),
      lit("\",\"msg\":\"Slow query\",\"attr\":\"overloaded\"}"))
    val slowBadNs = concat( // ns number → AttributeError 'int'...'split'
      lit("{\"t\":{\"$date\":\""), ts,
      lit("\"},\"s\":\"I\",\"c\":\"COMMAND\",\"id\":51803,\"ctx\":\"conn"), s(uid),
      lit("\",\"msg\":\"Slow query\",\"attr\":{\"ns\":"), s(eid % 100),
      lit(",\"durationMillis\":"), dur, lit("}}"))
    val slowBadCmd = concat( // command scalar → TypeError not iterable
      lit("{\"t\":{\"$date\":\""), ts,
      lit("\"},\"s\":\"I\",\"c\":\"COMMAND\",\"id\":51803,\"ctx\":\"conn"), s(uid),
      lit("\",\"msg\":\"Slow query\",\"attr\":{\"ns\":\""), appNs,
      lit("\",\"command\":"), s(eid % 50),
      lit(",\"durationMillis\":"), dur, lit("}}"))
    val nonSlowBadT = concat( // scalar t but non-slow → stays non_slow
      lit("{\"t\":"), s(eid),
      lit(",\"s\":\"I\",\"c\":\"NETWORK\",\"id\":22944,\"ctx\":\"listener\",\"msg\":\"Client metadata\",\"attr\":{\"remote\":\"10.0.0."),
      s(uid % 255), lit("\"}}"))

    val viewLine =
      when(eid % 7 === 0, slowBadT)
        .when(eid % 7 === 1, slowBadAttr)
        .when(eid % 7 === 2, slowBadNs)
        .when(eid % 7 === 3, slowBadCmd)
        .when(eid % 7 === 4, nonSlowBadT)
        .otherwise(viewNoise)

    val signupLine = when(eid % 3 === 0,
        concat(lit("signup event "), s(uid), lit(" at "), ts, lit(" {unterminated")))
      .otherwise(concat(
        lit("{\"t\":{\"$date\":\""), ts, lit("\"},\"s\":\"I\",\"c\":\"ACCESS\",\"msg\":\"Successfully authenticated\",\"attr\":{\"principal\":\"u"),
        s(uid), lit("\"}}")))

    // MATERIALIZATION BARRIERS, two distinct jobs:
    // (a) OpaqueBarrier pins the ~500-node line-rendering expression to
    //     ONE evaluation per row: without it, CollapseProject re-inlines
    //     the render into every downstream reference of `line`, and
    //     PushDownPredicate copies it into pushed filter conjuncts (a
    //     shuffle alone does NOT stop the latter — predicates push
    //     through RepartitionByExpression, observed in round 6 as the
    //     full render + 11 from_json copies in one Filter below this
    //     exchange).
    // (b) repartition spreads the tiny single-partition events scan so
    //     the mongo branch doesn't run one-threaded at bench SFs.
    graft.engine.expr.NativeFunctions.ensureRegistered(spark)
    ev.select(
      graft.engine.expr.NativeFunctions.opaque(
        when(col("event_type") === "click", slowFind)
          .when(col("event_type") === "purchase", slowAgg)
          .when(col("event_type") === "error", errorLine)
          .when(col("event_type") === "view", viewLine)
          .otherwise(signupLine)).as("line"),
      (eid + 1).as("line_no"))
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt)
  }
}
