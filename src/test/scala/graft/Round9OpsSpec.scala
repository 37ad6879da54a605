package graft

import org.apache.spark.sql.functions._
import graft.engine.ext.{Dedup, Sessionize, Similarity, TextAnalysis}

/** Handcrafted-fixture semantics for the round-9 operators (the DuckDB
  * oracles cover the full-table runs; these pin the edge cases a census
  * can mask: block-boundary carry, full-coverage removal, clean bench
  * docs, empty strata).
  */
class Round9OpsSpec extends SparkTestBase {
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("r9ops").toString
    rows.map { case (id, t) => (id, t, "xx", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("disorderCensus carries the high-water mark across block boundaries") {
    // arrival order (event_id): ts 100, 400, 250, 90 — blockSize 2 puts
    // the late events in the SECOND block, so their lateness comes from
    // the prev-block HWM (400), exercising the two-level carry.
    val ev = Seq(
      (1L, 100L, 1L, "click"),
      (2L, 400L, 1L, "click"),
      (3L, 250L, 2L, "click"),
      (4L, 90L, 2L, "click"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    val got = Sessionize.disorderCensus(ev, blockSize = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // lateness: 0, 0, 150 (400-250), 310 (400-90)
    // buckets: 150 → bin length 8; 310 → 9
    assert(got.toSeq === Seq(
      ("click", 0L, 2L, 0L, 0L),
      ("click", 8L, 1L, 150L, 150L),
      ("click", 9L, 1L, 310L, 310L)))
  }

  test("disorderCensus of an in-order stream is all bucket 0") {
    val ev = (1L to 10L).map(i => (i, i * 1000L, 1L, "view"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    val got = Sessionize.disorderCensus(ev, blockSize = 3L).collect()
    assert(got.length === 1)
    assert(got.head.getLong(1) === 0L) // bucket
    assert(got.head.getLong(2) === 10L) // n_events
  }

  test("spanRemoval cuts shared spans and passes clean docs through whole") {
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    val dir = docsDir(Seq(
      1L -> s"$shared tail1 only here",
      2L -> s"lead2 $shared",
      3L -> "completely unrelated words nothing shared at all among docs"))
    val got = Dedup.spanRemoval(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toMap
    // doc 1: 15 tokens, span = tok1..tok12 → kept "tail1 only here"
    assert(got(1L)._1 === 15L && got(1L)._2 === 3L && got(1L)._3 === 12L)
    assert(got(1L)._4 ===
      org.apache.commons.codec.digest.DigestUtils.md5Hex("tail1 only here"))
    // doc 2: 13 tokens, kept "lead2"
    assert(got(2L)._2 === 1L)
    // doc 3: untouched, kept hash = md5 of its own token stream
    assert(got(3L)._3 === 0L)
    assert(got(3L)._4 === org.apache.commons.codec.digest.DigestUtils
      .md5Hex("completely unrelated words nothing shared at all among docs"))
  }

  test("firewall13 flags only bench docs sharing a 13-gram with training") {
    val gram = (1 to 13).map(i => s"w$i").mkString(" ")
    val dir = docsDir(Seq(
      0L -> s"$gram suffix stuff here",            // bench (0 % 17 == 0), hit
      17L -> "own private sentence with fourteen distinct tokens one two three four five six seven", // bench, clean
      2L -> s"training copy: $gram and more text")) // train carries the gram
    val got = Dedup.firewall13(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(4))).toMap
    assert(got(0L)._1 >= 1L && got(0L)._2 === true)
    assert(got(17L) === ((0L, false)))
  }

  test("fertility is an exact ratio of sums per stratum") {
    val dir = docsDir(Seq(1L -> "ab cd, ef", 2L -> "gh ij"))
    // words: 3 + 2 = 5; subtokens: (ab cd , ef)=4 + 2 = 6; chars: 9+5=14
    val r = TextAnalysis.fertility(spark, dir).collect()
    assert(r.length === 1)
    assert(r.head.getLong(2) === 2L)              // n_docs
    assert(r.head.getLong(3) === 5L)              // sum_words
    assert(r.head.getLong(4) === 6L)              // sum_subtokens
    assert(r.head.getLong(5) === 6L * 1000L / 5L) // fertility_milli
    assert(r.head.getLong(6) === 14L * 1000L / 6L)
  }

  test("pqDriftAudit reports both halves over every subspace") {
    val dir = "/root/testdata/sf0.001"
    val got = Similarity.pqDriftAudit(spark, dir).collect()
    assert(got.length === 16) // 2 halves × M=8 subspaces
    val halves = got.map(_.getLong(0)).toSet
    assert(halves === Set(0L, 1L))
    // every vector of the table is encoded exactly once per subspace
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(got.map(_.getLong(2)).sum === n * 8)
  }
}
