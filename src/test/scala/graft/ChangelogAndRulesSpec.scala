package graft

import org.apache.spark.sql.functions._

import graft.engine.ext.{Changelog, Corpus, Sessionize, Similarity, TextAnalysis}

/** Handcrafted-fixture semantics for the CDC merge, Gopher rule bits,
  * lateness sweep, hash sampler, and IVF range search.
  */
class ChangelogAndRulesSpec extends SparkTestBase {
  import spark.implicits._

  // ------------------------------------------------------------- CDC merge

  private def log(rows: (Long, Long, Long, String, Long)*) =
    rows.toDF("event_id", "user_id", "ts_us", "event_type", "value_c")
      .withColumn("op",
        when(pmod(col("event_id"), lit(13L)) === 0L, "D").otherwise("U"))

  test("cdc merge: delta wins, tombstone drops the key, op counts add") {
    // base: u1 upsert, u2 upsert, u3 upsert
    val base = Changelog.state(log(
      (1L, 1L, 100L, "view", 10L),
      (2L, 1L, 200L, "click", 20L), // u1 latest in base
      (3L, 2L, 150L, "view", 30L),
      (4L, 3L, 160L, "view", 40L)))
    // delta: u1 newer upsert, u2 ends in DELETE (id 26 % 13 == 0), u4 new
    val delta = Changelog.state(log(
      (20L, 1L, 300L, "purchase", 50L),
      (26L, 2L, 400L, "click", 60L), // tombstone
      (21L, 4L, 350L, "view", 70L)))
    val got = Changelog.merge(base, delta)
      .orderBy(col("user_id"))
      .select("user_id", "event_type", "value_c", "last_ts_us", "n_ops")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "purchase", 50L, 300L, 3L), // delta overwrote base, 2+1 ops
      (3L, "view", 40L, 160L, 1L),     // base-only key survives
      (4L, "view", 70L, 350L, 1L)))    // delta-only key appears; u2 gone
  }

  test("cdc merge: equal-timestamp ties break by event_id (LSN order)") {
    val s = Changelog.state(log(
      (5L, 9L, 100L, "view", 1L),
      (6L, 9L, 100L, "click", 2L))) // same ts, higher id wins
    val r = s.select("event_type", "n_ops").as[(String, Long)].head()
    assert(r === ("click", 2L))
  }

  // ------------------------------------------------------- Gopher rule bits

  private def rulesFor(text: String): Map[String, Long] = {
    val df = TextAnalysis.gopherRules(
      Seq((1L, text)).toDF("doc_id", "text"))
    val row = df.head()
    df.columns.zipWithIndex.collect {
      case (c, i) if c.startsWith("r_") || c == "pass" => c -> row.getLong(i)
    }.toMap
  }

  private val healthy =
    (("the data and that have with pipeline be of to scale " * 6).trim)

  test("gopher rules: healthy doc passes every rule") {
    val r = rulesFor(healthy)
    assert(r.values.forall(_ == 1L), r.toString)
  }

  test("gopher rules: each rule trips on its own pathology") {
    // too short (< 50 tokens)
    assert(rulesFor("the data and that have be")("r_word_count") === 0L)
    // mean word length > 10
    val longWords = Seq.fill(60)("supercalifragilistic").mkString(" ")
    assert(rulesFor(longWords)("r_mean_word") === 0L)
    // hash symbols > 10% of tokens
    val hashy = healthy + " " + Seq.fill(20)("#").mkString(" ")
    assert(rulesFor(hashy)("r_hash_ratio") === 0L)
    // >30% of lines end in ellipsis
    val ellipsis = Seq.fill(4)(healthy + "...").mkString("\n")
    assert(rulesFor(ellipsis)("r_ellipsis") === 0L)
    // <80% alphabetic tokens
    val numeric = healthy + " " + (1 to 60).map(_.toString).mkString(" ")
    assert(rulesFor(numeric)("r_alpha") === 0L)
    // duplicate lines > 30%
    val dup = Seq.fill(5)(healthy).mkString("\n")
    assert(rulesFor(dup)("r_dup_lines") === 0L)
    // fewer than two stopwords
    val noStop = Seq.fill(60)("quartz").mkString(" ")
    assert(rulesFor(noStop)("r_stopwords") === 0L)
    // every pathological doc fails the conjunction
    assert(rulesFor(dup)("pass") === 0L)
  }

  // -------------------------------------------------------- lateness sweep

  test("lateness sweep: counts events trailing the per-partition running max") {
    // one ingest partition (ids all ≡ 1 mod 8): arrival order 1,9,17,25
    // event times 100s, 30s, 95s, 200s → running max 100,100,100,200
    // late@0: 30s and 95s trail the 100s watermark; late@60s: only 30s
    // (30 < 100-60); late@5min and beyond: none
    val s = 1000000L
    val ev = Seq(
      (1L, 1L, 100 * s), (9L, 1L, 30 * s), (17L, 1L, 95 * s),
      (25L, 1L, 200 * s))
      .toDF("event_id", "user_id", "ts_us")
    val got = Sessionize.latenessAudit(ev)
      .select("delay_us", "n_late", "n_events", "late_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (0L, 2L, 4L, 500000L),
      (60 * s, 1L, 4L, 250000L),
      (300 * s, 0L, 4L, 0L),
      (1800 * s, 0L, 4L, 0L)))
  }

  // ----------------------------------------------------------- hash sample

  test("hash sample: under-cap sources keep everything, over-cap get a rate") {
    // sources: a=8 docs, b=2 docs → total 10, 2 sources, target ceil(10/2)=5
    // a: rate = 5e6/8 = 625000 ppm; b: capped at 1e6 (keeps both docs)
    val docs = ((1 to 8).map(i => (i.toLong, s"text $i", "a")) ++
      Seq((9L, "text 9", "b"), (10L, "text 10", "b")))
      .toDF("doc_id", "text", "source")
    val a = Corpus.hashSample(docs).filter(col("source") === "a")
      .select("rate_ppm", "n_kept", "n_docs").as[(Long, Long, Long)].head()
    assert(a._1 === 625000L && a._2 <= a._3)
    val b = Corpus.hashSample(docs).filter(col("source") === "b")
      .select("rate_ppm", "n_kept").as[(Long, Long)].head()
    assert(b === ((1000000L, 2L))) // rate 1e6 ⇒ hash mod 1e6 always < rate
    // determinism: same fixture, same survivors
    assert(Corpus.hashSample(docs).collect().toSeq ===
      Corpus.hashSample(docs).collect().toSeq)
  }

  // ---------------------------------------------------------- DAU / MAU

  test("dau/mau: rolling 28-day distinct via contribution intervals") {
    val dayUs = 86400L * 1000000
    // user 1 active on days 0 and 30; user 2 on day 0 only.
    // day 0: dau 2, mau 2. day 27: dau 0 but both day-0 tails still
    // reach → mau 2. days 28-29: every tail expired → no row at all.
    // day 30: only user 1's new activity → dau 1, mau 1.
    val ev = Seq(
      (1L, 1L, 0 * dayUs), (2L, 2L, 0 * dayUs), (3L, 1L, 30 * dayUs))
      .toDF("event_id", "user_id", "ts_us")
    val got = Sessionize.dauMau(ev)
      .select("day", "dau", "mau28", "stickiness_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.head === ((0L, 2L, 2L, 1000000L)))
    assert(got.filter(_._1 == 27L) === Seq((27L, 0L, 2L, 0L)))
    assert(!got.exists(r => r._1 == 28L || r._1 == 29L)) // no active tail
    assert(got.last === ((30L, 1L, 1L, 1000000L)))
  }

  // ------------------------------------------------------- forward fill

  test("forward fill carries the last observed daily value across gaps") {
    val dayUs = 86400L * 1000000
    // user 9: day 10 → 5¢ (two events; the later one wins), days 11-12
    // unobserved, day 13 → 7¢. Carried series: 5,5,5,7 → sum 22.
    val ev = Seq(
      (1L, 9L, 10 * dayUs + 50L, 0.03),
      (2L, 9L, 10 * dayUs + 99L, 0.05),
      (3L, 9L, 13 * dayUs, 0.07))
      .toDF("event_id", "user_id", "ts_us", "value")
    val got = Sessionize.forwardFill(ev)
      .select("user_id", "n_days", "n_observed", "n_filled", "sum_carried_c")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((9L, 4L, 2L, 2L, 22L)))
  }

  // ------------------------------------------------------ snapshot diff

  test("snapshot diff classifies added/changed/removed/unchanged exactly") {
    // id 3: %11==3 → absent from the previous snapshot (added)
    // id 13: %13==0 → previous revision upper-cased (changed)
    // id 5: %17==5 → ghost -5 existed before and was deleted (removed)
    // ids 1, 5: byte-identical in both snapshots (unchanged)
    val docs = Seq(
      (1L, "alpha text", "s"), (3L, "beta text", "s"),
      (5L, "gamma text", "s"), (13L, "delta text", "s"))
      .toDF("doc_id", "text", "source")
    val got = graft.engine.ext.Corpus.snapshotDiff(docs)
      .select("source", "status", "n_docs", "min_doc_id", "max_doc_id")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("s", "added", 1L, 3L, 3L),
      ("s", "changed", 1L, 13L, 13L),
      ("s", "removed", 1L, -5L, -5L),
      ("s", "unchanged", 2L, 1L, 5L)))
  }

  // ------------------------------------------------------ triangle census

  test("triangles: a clique closes, a chain does not") {
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("doc_a", "doc_b")
    val got = graft.engine.ext.Dedup.trianglesFromPairs(pairs)
      .select("doc_id", "degree", "n_triangles", "closure_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 2L, 1L, 1000000L), // in the 1-2-3 clique: fully closed
      (2L, 2L, 1L, 1000000L),
      (3L, 3L, 1L, 333333L),  // hub: clique on one side, chain on the other
      (4L, 2L, 0L, 0L),       // chain link: open wedge, no triangle
      (5L, 1L, 0L, 0L)))      // leaf: degree < 2 → closure 0 by definition
  }

  // ------------------------------------------------------- IVF range search

  test("range search: single-cell corpus returns exactly the ≥minDot pairs") {
    // 2 centroids (vec_id 0,1); all vectors aligned with centroid 0, so
    // one cell holds everything and range search == brute-force threshold
    def vec(xs: Long*) = xs.toArray
    val vs = Seq(
      (0L, 0, vec(1000L, 0L)), (1L, 0, vec(-1000L, 0L)),
      (2L, 0, vec(900L, 100L)), (3L, 0, vec(800L, -100L)),
      (4L, 0, vec(500L, 500L)))
      .toDF("vec_id", "label", "q")
    graft.engine.expr.NativeFunctions.ensureRegistered(spark)
    // queries: vec_id % 2 == 0 → 0, 2, 4
    val got = Similarity.ivfRangeSearch(vs, minDot = 700000L, queryMod = 2,
      nCells = 2, nprobe = 1)
      .select("query_id", "neighbor_id", "dot")
      .as[(Long, Long, Long)].collect().toSeq
    // exact dots: (0,2)=900k (0,3)=800k (0,4)=500k (2,3)=710k (2,4)=500k
    // (2,0)=900k (4,0)=500k... threshold 700k keeps:
    assert(got === Seq(
      (0L, 2L, 900000L), (0L, 3L, 800000L),
      (2L, 0L, 900000L), (2L, 3L, 710000L)))
  }
}
