package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.engine.ext.Dedup
import graft.engine.streaming.DedupStream

/** Streaming MinHash-LSH dedup: cross-batch pair detection (the property
  * batch dedup fundamentally lacks) and single-batch agreement with the
  * batch operator's pair set.
  */
class DedupStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming LSH pairs a new arrival with an earlier batch's doc") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val pairs = DedupStream.pairs(mem.toDF().toDF("doc_id", "text"))
    val q = pairs.writeStream.format("memory")
      .queryName("stream_dedup").outputMode("append").start()
    val base = "the quick brown fox jumps over the lazy dog while the " +
      "sun sets behind distant hills tonight"
    try {
      mem.addData(
        (1L, base),
        (2L, "completely different content about spark execution " +
          "engines and shuffle boundaries here"))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM stream_dedup").collect().isEmpty)

      mem.addData((3L, base + " indeed")) // near-dup of doc 1, LATER batch
      q.processAllAvailable()
      val got = spark.sql("SELECT DISTINCT doc_a, doc_b FROM stream_dedup")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((1L, 3L)))
    } finally q.stop()
  }

  test("one-batch stream reproduces the batch LSH pair set") {
    implicit val sqlCtx = spark.sqlContext
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val expected = Dedup.minhashPairs(src)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty) // fixture must actually contain near-dups

    val mem = MemoryStream[(Long, String)]
    val q = DedupStream.pairs(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory")
      .queryName("stream_dedup_batch").outputMode("append").start()
    try {
      mem.addData(src.collect().map(r => (r.getLong(0), r.getString(1))).toSeq: _*)
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT DISTINCT doc_a, doc_b FROM stream_dedup_batch")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected)
    } finally q.stop()
  }

  test("oracle-checked batch twin states the stream's exact emitted set") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val src = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val q = DedupStream.pairs(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory")
      .queryName("stream_dedup_twin").outputMode("append").start()
    try {
      mem.addData(src.collect().map(r => (r.getLong(0), r.getString(1))).toSeq: _*)
      q.processAllAvailable()
      // full rows this time — per agreeing band, with the ppm estimate —
      // must equal the registered stream_dedup_batch query exactly
      val streamed = spark.sql(
        "SELECT doc_a, doc_b, band, est_jaccard_ppm FROM stream_dedup_twin")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getInt(2).toLong, r.getLong(3))).toSet
      val batch = DedupStream.pairsBatch(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2), r.getLong(3))).toSet
      assert(batch === streamed)
      assert(batch.nonEmpty)
    } finally q.stop()
  }
}
