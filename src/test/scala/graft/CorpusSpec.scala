package graft

import org.apache.spark.sql.functions._
import graft.engine.ext.Corpus

/** Corpus-assembly operators: determinism/partition invariants plus the
  * plan shapes that make them viable at 100 TB.
  */
class CorpusSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("splitAssign partitions the corpus deterministically") {
    val a = Corpus.splitAssign(spark, sf).collect()
    val b = Corpus.splitAssign(spark, sf).collect()
    assert(a.toSeq === b.toSeq) // content-hash, not RNG
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(a.length === total)
    assert(a.map(_.getAs[String]("split")).toSet.subsetOf(Set("train", "val", "test")))
    // hash buckets must cover the assignment rule's domain
    assert(a.forall { r =>
      val bkt = r.getAs[Long]("bucket"); bkt >= 0 && bkt < 100
    })
  }

  test("dedupWeights: a duplicate pair shares one doc's mass, uniques keep full weight") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dw").toString
    val dup = "the quick brown fox jumps over the lazy dog today"
    Seq(
      (1L, dup, "en", "a", dup.length.toLong),
      (2L, dup, "en", "a", dup.length.toLong),
      (3L, "completely unrelated words about spacecraft navigation systems engineering", "zh", "b", 74L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Corpus.dedupWeights(spark, dir).collect()
      .map(x => (x.getAs[String]("lang"), x.getAs[Long]("n_docs"),
        x.getAs[Long]("n_dup_docs"), x.getAs[Long]("raw_tokens"),
        x.getAs[Long]("eff_tokens_micro"), x.getAs[Long]("eff_ppm"))).toSeq
    // en: the two 10-token dups each weigh 500000 ppm → 20 raw tokens
    // carry 10,000,000 micro-tokens of mass (half); zh keeps full weight
    assert(r === Seq(
      ("en", 2L, 2L, 20L, 10000000L, 500000L),
      ("zh", 1L, 0L, 8L, 8000000L, 1000000L)))
  }

  test("packStats counts boundary straddles and tail fill per source") {
    import spark.implicits._
    // 6-token docs, budget 10: starts 0,6,12 -> doc 2 straddles the
    // pack-0/1 boundary; doc 3 sits inside pack 1; tail = 18 % 10
    val six = "t1 t2 t3 t4 t5 t6"
    val d = Seq((1L, six, "en", "a"), (2L, six, "en", "a"), (3L, six, "en", "a"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val got = Corpus.packStats(d, b = 10L).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("total_tokens"), r.getAs[Long]("n_packs"),
        r.getAs[Long]("n_split_docs"), r.getAs[Long]("split_ppm"),
        r.getAs[Long]("tail_fill_ppm")))
    assert(got.toSeq === Seq(("a", 3L, 18L, 2L, 1L, 333333L, 800000L)))
  }

  test("batchDrift buckets arrival order per source and scores each batch") {
    import spark.implicits._
    val good = "one two three four five."   // 5 tokens, terminal → keep
    val bad = "short"                        // too_short
    val d = Seq(
      (1L, good, "en", "a"), (2L, bad, "en", "a"),  // batch 0: 1/2 keep
      (3L, good, "en", "a"), (4L, good, "en", "a"), // batch 1: 2/2 keep
      (5L, bad, "en", "b"))                          // b batch 0: 0/1
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val got = Corpus.batchDrift(d, batch = 2).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("batch_no"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_keep"),
        r.getAs[Long]("keep_ppm")))
    assert(got.toSeq === Seq(
      ("a", 0L, 2L, 1L, 500000L),
      ("a", 1L, 2L, 2L, 1000000L),
      ("b", 0L, 1L, 0L, 0L)))
  }

  test("lengthStats: exact ceil(p·n) rank percentiles per source") {
    import spark.implicits._
    val d = (Seq(10L, 20L, 30L, 40L, 50L).zipWithIndex.map { case (c, i) =>
      (i.toLong, "x", "en", "a", c)
    } :+ ((9L, "x", "en", "b", 7L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Corpus.lengthStats(d).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("min_chars"), r.getAs[Long]("median_chars"),
        r.getAs[Long]("p90_chars"), r.getAs[Long]("max_chars")))
    // a: n=5 → median rank 3 (30), p90 rank ceil(4.5)=5 (50)
    assert(got.toSeq === Seq(
      ("a", 5L, 10L, 30L, 50L, 50L),
      ("b", 1L, 7L, 7L, 7L, 7L)))
  }

  test("dupQuality cells partition the corpus and keep_ppm is exact integer") {
    val r = Corpus.dupQuality(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(r.map(_.getAs[Long]("n_docs")).sum === total) // cells partition docs
    r.foreach { row =>
      val (n, k, ppm) = (row.getAs[Long]("n_docs"), row.getAs[Long]("n_keep"),
        row.getAs[Long]("keep_ppm"))
      assert(k >= 0 && k <= n)
      assert(ppm === k * 1000000L / n) // exact integer div, oracle's // semantics
    }
    // (lang, is_dup) is a key: no duplicate cells
    val keys = r.map(x => (x.getAs[String]("lang"), x.getAs[Boolean]("is_dup")))
    assert(keys.distinct.length === keys.length)
  }

  test("manifest signature is order-insensitive and content-sensitive") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mf").toString
    def write(rows: Seq[(Long, String)], parts: Int): Unit =
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .repartition(parts)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val base = Seq(1L -> "alpha beta", 2L -> "gamma delta", 3L -> "epsilon")
    write(base, 1)
    val sig1 = Corpus.manifest(spark, dir).collect()
      .map(r => r.getAs[Long]("content_sig")).head
    // same content, different row order and partitioning → same signature
    write(base.reverse, 3)
    val sig2 = Corpus.manifest(spark, dir).collect()
      .map(r => r.getAs[Long]("content_sig")).head
    assert(sig1 === sig2)
    // one changed document → signature flips
    write(base.init :+ (3L -> "epsilon CHANGED"), 1)
    val sig3 = Corpus.manifest(spark, dir).collect()
      .map(r => r.getAs[Long]("content_sig")).head
    assert(sig1 !== sig3)
  }

  test("packSequences fills budget-bounded packs per source") {
    val rows = Corpus.packSequences(spark, sf).collect()
    assert(rows.forall(r => r.getAs[Long]("pack_offset") >= 0 &&
      r.getAs[Long]("pack_offset") < Corpus.PackBudget))
    // pack ids within a source are contiguous from 0
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (_, rs) =>
      val packs = rs.map(_.getAs[Long]("pack_id")).distinct.sorted
      assert(packs.head === 0L)
      assert(packs === (0L until packs.length).toSeq)
    }
  }

  test("stratifiedSample keeps exactly K per class and plans a group limit") {
    val df = Corpus.stratifiedSample(spark, sf)
    val counts = df.groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val classSizes = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    classSizes.foreach { case (lang, n) =>
      assert(counts(lang) === math.min(n, Corpus.StratifiedK.toLong))
    }
    // the rank filter must push a partial per-partition limit below the
    // shuffle (WindowGroupLimit), or the per-class sort carries the corpus
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("qualityClean runs unchanged as a streaming gate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String, String, String)]
    val gated = Corpus.qualityClean(
      mem.toDF().toDF("doc_id", "lang", "source", "text"))
      .groupBy(col("reason")).agg(count(lit(1)).as("n"))

    val q = gated.writeStream.format("memory")
      .queryName("stream_clean").outputMode("complete").start()
    try {
      mem.addData(
        (1L, "en", "s0", "This is a perfectly reasonable document sentence."),
        (2L, "en", "s0", "short"),                       // too_short
        (3L, "en", "s0", "a b c d e f g h with no end"), // no_terminal_punct
        (4L, "en", "s0", "!!! ??? ### $$$ %%% ^^^ &&&!"))// too_much_punct
      q.processAllAvailable()
      val rows = spark.sql("SELECT reason, n FROM stream_clean").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows === Map("" -> 1L, "too_short" -> 1L,
        "no_terminal_punct" -> 1L, "too_much_punct" -> 1L))
    } finally q.stop()
  }

  test("weightedInterleave prefixes approach the 4:2:2:2:1 mix") {
    val rows = Corpus.weightedInterleave(spark, sf).collect()
    // keys strictly order the corpus modulo (lang, doc_id) tie-break
    assert(rows.length ===
      spark.read.parquet(s"$sf/documents.parquet").count())
    // in any long prefix, en (w=4) appears ~4x as often as zh (w=1),
    // as long as neither class has been exhausted
    val prefix = rows.take(rows.length / 2)
    val byLang = prefix.groupBy(_.getAs[String]("lang")).view.mapValues(_.length)
    val langTotals = rows.groupBy(_.getAs[String]("lang")).view.mapValues(_.length)
    if (langTotals("en") > prefix.length / 2 && langTotals.getOrElse("zh", 0) > 0) {
      val ratio = byLang("en").toDouble / math.max(byLang.getOrElse("zh", 0), 1)
      assert(ratio > 2.0, s"en:zh prefix ratio $ratio not upsampled")
    }
  }

  test("temperatureWeights upsamples low-resource languages, shares sum to 1e6") {
    val w = Corpus.temperatureWeights(spark, sf).collect()
    assert(w.length >= 2)
    val rawBySz = w.sortBy(_.getAs[Long]("n_tokens"))
    // sqrt-temperature: the smallest language's share RISES vs raw, the
    // largest language's share FALLS
    assert(rawBySz.head.getAs[Double]("upsample") > 1.0, rawBySz.head.toString)
    assert(rawBySz.last.getAs[Double]("upsample") < 1.0, rawBySz.last.toString)
    // both share columns are (rounded) distributions over the corpus
    def tot(c: String) = w.map(_.getAs[Double](c)).sum
    assert(math.abs(tot("raw_ppm") - 1e6) < 1.0, tot("raw_ppm").toString)
    assert(math.abs(tot("temp_ppm") - 1e6) < 1.0, tot("temp_ppm").toString)
  }

  test("chunks: overlapping windows cover every token with correct provenance") {
    import spark.implicits._
    val words56 = (1 to 56).map(i => s"w$i").mkString(" ")
    val words10 = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, words56, "en", "a", 0L), (2L, words10, "en", "a", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Corpus.chunks(docs, 32, 24)
      .orderBy("doc_id", "chunk_no").collect()
    val d1 = rows.filter(_.getLong(0) == 1L)
    val d2 = rows.filter(_.getLong(0) == 2L)
    // 56 tokens, window 32, stride 24 → chunks at 1 and 25, both full-width
    assert(d1.map(r => (r.getAs[Long]("chunk_no"), r.getAs[Long]("start_token"),
      r.getAs[Long]("n_chunk_tokens"))).toSeq ===
      Seq((0L, 1L, 32L), (1L, 25L, 32L)))
    // a short doc still yields exactly one (short) chunk
    assert(d2.map(r => (r.getAs[Long]("chunk_no"), r.getAs[Long]("n_chunk_tokens")))
      .toSeq === Seq((0L, 10L)))
    // coverage: every token index 1..56 appears in some chunk's window
    val covered = d1.flatMap { r =>
      val s = r.getAs[Long]("start_token")
      s until s + r.getAs[Long]("n_chunk_tokens")
    }.toSet
    assert(covered === (1L to 56L).toSet)
    // the chunk text really is the slice it claims to be
    assert(d1(1).getAs[String]("chunk_text") ===
      (25 to 56).map(i => s"w$i").mkString(" "))
  }
}
