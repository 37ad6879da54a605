package graft

import org.apache.spark.sql.functions._
import graft.engine.ext.{Sessionize, TextAnalysis}

/** Unit tests for text analysis and sessionization on controlled inputs
  * (the DuckDB oracles cover the full-table runs; these pin semantics on
  * known sentences/gaps).
  */
class ExtOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("extops").toString
    rows.map { case (id, t) => (id, t, "xx", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("langId picks the language with the most stopword hits") {
    val dir = docsDir(Seq(
      1L -> "the cat and the dog sat on a mat for hours",
      2L -> "el gato y la casa de un amigo por la noche",
      3L -> "le chien et la maison dans un jardin pour avec",
      4L -> "人工智能正在改变世界",
      5L -> "zzz qqq xxx"))
    val got = TextAnalysis.langId(spark, dir).orderBy("doc_id")
      .select("doc_id", "lang_pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "en", 2L -> "es", 3L -> "fr", 4L -> "zh",
      5L -> "unknown"))
  }

  test("analyze counts tokens, punctuation and ppm ratios exactly") {
    val dir = docsDir(Seq(1L -> "Hello, world! 42 times."))
    val r = TextAnalysis.analyze(spark, dir).head()
    assert(r.getAs[Long]("n_chars_m") === 23L)
    assert(r.getAs[Int]("n_tokens_ws") === 4)
    // BPE-ish: Hello , world ! 42 times . → 7
    assert(r.getAs[Int]("n_tokens_bpe") === 7)
    // , ! . → 3 punct marks
    assert(r.getAs[Int]("n_punct") === 3)
    assert(r.getAs[Long]("punct_ppm") === 3L * 1000000L / 23L)
  }

  test("fingerprint is whitespace/case-insensitive") {
    val dir = docsDir(Seq(1L -> "Hello   World", 2L -> "hello world",
      3L -> "different entirely"))
    val fps = TextAnalysis.analyze(spark, dir).orderBy("doc_id")
      .select("fingerprint").collect().map(_.getString(0))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("sessions split on gaps > 30 minutes and aggregate per session") {
    val dir = java.nio.file.Files.createTempDirectory("sess").toString
    // user 1: events at t0, t0+10min (same session), t0+50min (new session)
    val base = 1_700_000_000_000_000L // µs
    Seq(
      (1L, base, 1L, "click", 1.5, "{}"),
      (2L, base + 600L * 1000000, 1L, "click", 2.5, "{}"),
      (3L, base + 3000L * 1000000, 1L, "view", 4.0, "{}"),
      (4L, base, 2L, "click", 1.0, "{}"),
    ).toDF("event_id", "ts_us_raw", "user_id", "event_type", "value", "props")
      // store as TIMESTAMP_NTZ micros so `ts div 1000`... the testdata path
      // reads nanos; here we build the post-read shape directly instead.
      .withColumn("ts", expr("ts_us_raw * 1000")) // nanos long, as nanosAsLong yields
      .drop("ts_us_raw")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Sessionize.sessions(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq"),
        r.getAs[Long]("n_events"), r.getAs[Long]("sum_value_c")))
    assert(got.toSeq === Seq((1L, 1L, 2L, 400L), (1L, 2L, 1L, 400L),
      (2L, 1L, 1L, 100L)))
  }

  private def eventsFixture(rows: (Long, Long, Long, String)*): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ev").toString
    rows.map { case (id, tsUs, user, typ) => (id, tsUs, user, typ, 1.0, "{}") }
      .toDF("event_id", "ts_us_raw", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("ts_us_raw * 1000"))
      .drop("ts_us_raw")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("funnel counts steps only in view -> click -> purchase order") {
    val t = 1_700_000_000_000_000L
    val dir = eventsFixture(
      // user 1: full ordered funnel
      (1L, t, 1L, "view"), (2L, t + 10, 1L, "click"), (3L, t + 20, 1L, "purchase"),
      // user 2: purchase BEFORE click — depth stops at 2
      (4L, t, 2L, "view"), (5L, t + 5, 2L, "purchase"), (6L, t + 10, 2L, "click"),
      // user 3: click with no view — depth 0 (no step-1 anchor)
      (7L, t, 3L, "click"),
      // user 4: view only
      (8L, t, 4L, "view"))
    val got = Sessionize.funnel(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("depth")))
    assert(got.toSeq === Seq((1L, 3L), (2L, 2L), (3L, 0L), (4L, 1L)))
  }

  test("propsRollup parses the JSON sidecar and counts missing keys") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pr").toString
    Seq(
      (1L, 1_700_000_000_000_000_000L, 1L, "click", 1.0, """{"k": 5}"""),
      (2L, 1_700_000_000_000_000_000L, 1L, "click", 1.0, """{"k": 7}"""),
      (3L, 1_700_000_000_000_000_000L, 2L, "view", 1.0, """{"x": 9}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Sessionize.propsRollup(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_missing_k"),
        Option(r.getAs[java.lang.Long]("sum_k")).map(_.longValue),
        r.getAs[Long]("n_distinct_k")))
    assert(got.toSeq === Seq(
      ("click", 2L, 0L, Some(12L), 2L),
      ("view", 1L, 1L, None, 0L))) // all-null k group: SQL sum is NULL
  }

  test("gapHistogram buckets same-type gaps on a log2 scale") {
    val t = 1_700_000_000_000_000L
    val dir = eventsFixture(
      // user 1 clicks: gaps 1us (bucket 1), 7us (bucket 3 = len('111'))
      (1L, t, 1L, "click"), (2L, t + 1, 1L, "click"), (3L, t + 8, 1L, "click"),
      // user 2 clicks: simultaneous pair -> gap 0 -> bucket 0
      (4L, t, 2L, "click"), (5L, t, 2L, "click"),
      // user 2 view: single event, no gap emitted; cross-type gap ignored
      (6L, t + 100, 2L, "view"))
    val got = Sessionize.gapHistogram(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bucket"),
        r.getAs[Long]("n_gaps"), r.getAs[Long]("min_gap_us"),
        r.getAs[Long]("max_gap_us")))
    assert(got.toSeq === Seq(
      ("click", 0L, 1L, 0L, 0L),
      ("click", 1L, 1L, 1L, 1L),
      ("click", 3L, 1L, 7L, 7L)))
  }

  test("userLifetime rolls the per-user fold into an active-days histogram") {
    val day = 86_400_000_000L
    val t = 1_700_000_000_000_000L
    val dir = eventsFixture(
      // user 1: 2 events, 1 day  -> active_days 1, span 1
      (1L, t, 1L, "view"), (2L, t + 10, 1L, "click"),
      // user 2: days 0 and 2     -> active_days 2, span 3
      (3L, t, 2L, "view"), (4L, t + 2 * day, 2L, "view"),
      // user 3: one event        -> active_days 1, span 1
      (5L, t, 3L, "purchase"))
    val got = Sessionize.userLifetime(spark, dir).collect()
      .map(r => (r.getAs[Long]("active_days"), r.getAs[Long]("n_users"),
        r.getAs[Long]("n_events"), r.getAs[Long]("sum_span_days"),
        r.getAs[Long]("max_span_days")))
    assert(got.toSeq === Seq((1L, 2L, 3L, 2L, 1L), (2L, 1L, 2L, 3L, 3L)))
  }

  test("hourlySpikes flags hours beyond median + 3*MAD of the count series") {
    val h = 3_600_000_000L
    val t = 1_700_000_000_000_000L
    // click hours: counts 1,1,1,10 -> median 1, MAD 0, one spike hour
    val rows = Seq(
      (1L, t, 1L, "click"), (2L, t + h, 1L, "click"), (3L, t + 2 * h, 1L, "click")) ++
      (0 until 10).map(i => (10L + i, t + 3 * h + i, 1L, "click"))
    val dir = eventsFixture(rows: _*)
    val got = Sessionize.hourlySpikes(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_hours"),
        r.getAs[Long]("median_cnt"), r.getAs[Long]("mad_cnt"),
        r.getAs[Long]("n_spike_hours"), r.getAs[Long]("max_cnt")))
    assert(got.toSeq === Seq(("click", 4L, 1L, 0L, 1L, 10L)))
  }

  test("fulfillmentLag: exact ceil-rank percentiles incl. negative lags") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fl").toString
    // one priority, lags: -2, 1, 1, 3 -> p50 = ceil(4/2)=2nd = 1,
    // p99 = ceil(396/100)=4th = 3
    Seq((1L, "1995-01-03"), (2L, "1995-01-02"), (3L, "1995-01-02"),
        (4L, "1995-01-04"))
      .toDF("l_orderkey", "d")
      .select(col("l_orderkey"), col("d").cast("timestamp_ntz").as("l_shipdate"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, "1995-01-05", "1-URGENT"), (2L, "1995-01-01", "1-URGENT"),
        (3L, "1995-01-01", "1-URGENT"), (4L, "1995-01-01", "1-URGENT"))
      .toDF("o_orderkey", "d", "o_orderpriority")
      .select(col("o_orderkey"), col("d").cast("timestamp_ntz").as("o_orderdate"),
        col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.engine.ext.Relational.fulfillmentLag(spark, dir).collect()
      .map(r => (r.getAs[String]("o_orderpriority"), r.getAs[Long]("n_lines"),
        r.getAs[Long]("min_lag"), r.getAs[Long]("p50_lag"),
        r.getAs[Long]("p99_lag"), r.getAs[Long]("max_lag")))
    assert(got.toSeq === Seq(("1-URGENT", 4L, -2L, 1L, 3L, 3L)))
  }

  test("basketPairs counts distinct containing orders, not line pairs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bp").toString
    Seq((1L, 5L), (1L, 7L), (1L, 5L),  // order 1: parts {5,5,7} -> (5,7)x2 lines
        (2L, 5L), (2L, 7L),            // order 2: (5,7)
        (3L, 5L), (3L, 9L))            // order 3: (5,9)
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // orders table sizes the derived basket cap (8 at n=3 — clears the
    // 2-part baskets, so the cap is live but excludes nothing here)
    Seq(1L, 2L, 3L).toDF("o_orderkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.engine.ext.Relational.basketPairs(spark, dir, k = 2)
      .collect()
      .map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"),
        r.getAs[Long]("n_orders")))
    // (5,7) appears in 2 orders (3 line pairs — distinct-order count wins)
    assert(got.toSeq === Seq((5L, 7L, 2L), (5L, 9L, 1L)))
  }

  test("typeUnpivot melts the pivot back to the long census, no cells lost") {
    val t = 1_700_000_000_000_000L
    val dir = eventsFixture(
      (1L, t, 1L, "click"), (2L, t + 1, 1L, "click"), (3L, t + 2, 1L, "view"),
      (4L, t, 2L, "error"))
    val got = Sessionize.typeUnpivot(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("n")))
    assert(got.toSeq === Seq(
      (1L, "click", 2L), (1L, "view", 1L), (2L, "error", 1L)))
  }

  test("integrityAudit reports per-constraint violation counts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ia").toString
    Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 99L)) // dup pk 2; orphan cust 99
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, 5.0), (11L, -2.0)) // one negative balance
      .toDF("c_custkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, 10.0), (4L, 60.0)) // orphan orderkey 4; qty 60 out of domain
      .toDF("l_orderkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.engine.ext.Relational.integrityAudit(spark, dir).collect()
      .map(r => (r.getAs[String]("check_name"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_violations"), r.getAs[Long]("violation_ppm")))
    assert(got.toSeq === Seq(
      ("customer_negative_balance", 2L, 1L, 500000L),
      ("lineitem_fk_orders", 2L, 1L, 500000L),
      ("lineitem_qty_domain", 2L, 1L, 500000L),
      ("orders_fk_customer", 4L, 1L, 250000L),
      ("orders_pk_unique", 4L, 2L, 500000L)))
  }

  test("conversionLag buckets first-view to first-later-purchase time") {
    val t = 1_700_000_000_000_000L
    val dir = eventsFixture(
      // user 1: lag 7us -> bucket 3
      (1L, t, 1L, "view"), (2L, t + 7, 1L, "purchase"),
      // user 2: purchase BEFORE first view -> not a conversion
      (3L, t, 2L, "purchase"), (4L, t + 5, 2L, "view"),
      // user 3: view only; user 4: later purchase picks FIRST view, lag 1
      (5L, t, 3L, "view"),
      (6L, t, 4L, "view"), (7L, t + 10, 4L, "view"), (8L, t + 1, 4L, "purchase"))
    val got = Sessionize.conversionLag(spark, dir).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_users"),
        r.getAs[Long]("min_lag_us"), r.getAs[Long]("max_lag_us")))
    assert(got.toSeq === Seq((1L, 1L, 1L, 1L), (3L, 1L, 7L, 7L)))
  }

  test("yoyRevenue aligns on (year-1, month), first year gets NULLs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("yoy").toString
    Seq(("1995-03-01", 10.0), ("1995-03-02", 20.0), ("1996-03-05", 50.0),
        ("1997-01-01", 5.0)) // 1997-01 has no 1996-01 -> NULL prev
      .toDF("d", "o_totalprice")
      .select(col("d").cast("timestamp_ntz").as("o_orderdate"),
        col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.engine.ext.Relational.yoyRevenue(spark, dir).collect()
      .map(r => (r.getAs[Long]("y"), r.getAs[Long]("m"),
        r.getAs[Long]("revenue_c"),
        Option(r.getAs[java.lang.Long]("yoy_delta_c")).map(_.longValue)))
    assert(got.toSeq === Seq(
      (1995L, 3L, 3000L, None),
      (1996L, 3L, 5000L, Some(2000L)),
      (1997L, 1L, 500L, None)))
  }

  test("payloadDupes counts byte-identical payloads per format") {
    import spark.implicits._
    val m = Seq((1L, "aa"), (5L, "aa"), (2L, "bb")) // 1,5 -> png; 2 -> wav
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("media"),
        struct(
          element_at(array(lit("jpeg"), lit("png"), lit("wav"), lit("mp4")),
            (col("doc_id") % 4 + 1).cast("int")).as("format"),
          lit(1).as("width"), lit(1).as("height"), lit(1).as("nFrames"))
          .as("meta"))
    val got = graft.engine.ext.Multimodal.payloadDupes(m).collect()
      .map(r => (r.getAs[String]("format"), r.getAs[Long]("n_payloads"),
        r.getAs[Long]("n_media"), r.getAs[Long]("n_dup_items"),
        r.getAs[Long]("max_clones"), r.getAs[Long]("wasted_bytes")))
    assert(got.toSeq === Seq(
      ("png", 1L, 2L, 1L, 2L, 2L),
      ("wav", 1L, 1L, 0L, 1L, 0L)))
  }

  test("keySkew reads exact percentiles off the count-of-counts census") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ks").toString
    Seq((1L, 10L, 100L), (1L, 11L, 100L), (1L, 12L, 101L),
        (2L, 10L, 100L), (2L, 10L, 102L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.engine.ext.Relational.keySkew(spark, dir).collect()
      .map(r => (r.getAs[String]("key_name"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_keys"), r.getAs[Long]("max_n"),
        r.getAs[Long]("p50_n"), r.getAs[Long]("p99_n"),
        r.getAs[Long]("top_share_ppm")))
    assert(got.toSeq === Seq(
      ("l_orderkey", 5L, 2L, 3L, 2L, 3L, 600000L),
      ("l_partkey", 5L, 3L, 3L, 1L, 3L, 600000L),
      ("l_suppkey", 5L, 3L, 3L, 1L, 3L, 600000L)))
  }

  test("transitions count consecutive pairs per user, shares sum per from-type") {
    val t = 1_700_000_000_000_000L
    val dir = eventsFixture(
      // user 1: view -> click -> view -> click  (v->c ×2, c->v ×1)
      (1L, t, 1L, "view"), (2L, t + 10, 1L, "click"),
      (3L, t + 20, 1L, "view"), (4L, t + 30, 1L, "click"),
      // user 2: view -> view (self-loop); single-event users emit nothing
      (5L, t, 2L, "view"), (6L, t + 10, 2L, "view"),
      (7L, t, 3L, "purchase"))
    val got = Sessionize.transitions(spark, dir).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type"),
        r.getAs[Long]("n"), r.getAs[Long]("share_ppm")))
    assert(got.toSeq === Seq(
      ("click", "view", 1L, 1000000L),
      ("view", "click", 2L, 666666L),   // 2/3 of view's outgoing edges
      ("view", "view", 1L, 333333L)))
  }

  test("cms sketch never undercounts and is exact for a lone heavy key") {
    val t = 1_700_000_000_000_000L
    // user 9 is a planted heavy hitter: 50 events vs 1 each for 3 others
    val rows = (1 to 50).map(i => (100L + i, t + i, 9L, "view")) ++
      Seq((1L, t, 1L, "view"), (2L, t, 2L, "view"), (3L, t, 3L, "view"))
    val dir = eventsFixture(rows: _*)
    val got = Sessionize.cmsHitters(graft.engine.ingest.Sources.events(spark, dir))
      .collect()
    assert(got.length === 4)
    // CMS guarantee: estimates never undercount
    assert(got.forall(_.getAs[Long]("overcount") >= 0L))
    val heavy = got.find(_.getAs[Long]("user_id") == 9L).get
    assert(heavy.getAs[Long]("exact_cnt") === 50L)
    // d=4 rows x 64 buckets vs 4 keys: some hash row isolates the heavy
    // key, so its estimate is exact
    assert(heavy.getAs[Long]("cms_est") === 50L)
  }

  test("madOutliers: median and MAD ignore the extreme value that corrupts a mean") {
    // values 1,2,3,4,100 → median 3.00; deviations 2,1,0,1,97 →
    // MAD 1.00; only the 100 exceeds median ± 3·MAD
    val ev = Seq(
      (1L, "view", 1.0), (2L, "view", 2.0), (3L, "view", 3.0),
      (4L, "view", 4.0), (5L, "view", 100.0))
      .toDF("event_id", "event_type", "value")
    val r = Sessionize.madOutliers(ev).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_events") === 5L)
    assert(r(0).getAs[Long]("median_c") === 300L)
    assert(r(0).getAs[Long]("mad_c") === 100L)
    assert(r(0).getAs[Long]("n_outliers") === 1L)
  }

  test("retention: cohort is first-active day, offsets count distinct users") {
    val day = 86_400_000_000L
    val d0 = 19_000L * day
    val dir = eventsFixture(
      (1L, d0, 1L, "view"), (2L, d0 + day, 1L, "view"),     // user 1: day 0, 1
      (3L, d0 + 10, 2L, "view"), (4L, d0 + day, 2L, "view"), // user 2: day 0, 1
      (5L, d0 + day, 3L, "view"))                            // user 3: cohort day+1
    val got = Sessionize.retention(spark, dir).collect()
      .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("day_offset"),
        r.getAs[Long]("n_active_users")))
    assert(got.toSeq === Seq(
      (19000L, 0L, 2L), (19000L, 1L, 2L), (19001L, 0L, 1L)))
  }

  test("events normalizes every ts physical type to the same epoch micros") {
    import graft.engine.ingest.Sources
    val us = 1_700_000_000_123_456L // a non-round instant, micros
    def assertTsUs(dir: String): Unit = {
      val got = Sources.events(spark, dir).select("ts_us").head().getLong(0)
      assert(got === us, dir)
    }
    // 1. raw nanos Long (TIMESTAMP(NANOS) under nanosAsLong)
    val d1 = java.nio.file.Files.createTempDirectory("evl").toString
    Seq((1L, us * 1000L, 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d1/events.parquet")
    assertTsUs(d1)
    // 2. TimestampType (written as TIMESTAMP(MICROS, adjustedToUTC=true))
    val d2 = java.nio.file.Files.createTempDirectory("evt").toString
    Seq((1L, us, 1L, "view", 1.0, "{}"))
      .toDF("event_id", "tsu", "user_id", "event_type", "value", "props")
      .select(col("event_id"), expr("timestamp_micros(tsu)").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$d2/events.parquet")
    assertTsUs(d2)
    // 3. TimestampNTZType (isAdjustedToUTC=false — the current testdata
    // shape); wall clock written under the UTC session = the instant
    val d3 = java.nio.file.Files.createTempDirectory("evn").toString
    Seq((1L, us, 1L, "view", 1.0, "{}"))
      .toDF("event_id", "tsu", "user_id", "event_type", "value", "props")
      .select(col("event_id"),
        expr("cast(timestamp_micros(tsu) AS timestamp_ntz)").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$d3/events.parquet")
    assertTsUs(d3)
  }
}
