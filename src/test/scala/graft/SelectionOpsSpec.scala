package graft

import graft.engine.ext.{Corpus, TextAnalysis}

/** Handcrafted-fixture semantics for the data-selection operators added
  * after the round-9 surface (BM25 retrieval, DSIR importance scoring,
  * per-source TV drift). The DuckDB oracles pin full-table parity; these
  * pin the DISCRIMINATING behaviors: BM25's length normalization and tf
  * saturation (which plain tf-idf cannot express), DSIR's target-affinity
  * ordering, and TV's zero / maximal-divergence endpoints.
  */
class SelectionOpsSpec extends SparkTestBase {
  import spark.implicits._

  /** documents.parquet fixture with explicit (doc_id, text, source). */
  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("selops").toString
    rows.map { case (id, t, src) => (id, t, "xx", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("bm25 ranks by length norm and saturates tf (tf-idf can do neither)") {
    // Query doc 0 carries ONE bigram "alpha beta". All four index docs
    // match it with equal idf; what separates them is BM25's two knobs:
    //   doc 3: tf=2, dl=4  — saturated boost, top
    //   doc 1: tf=1, dl=3  — shortest, beats equal-tf longer docs
    //   doc 4: tf=1, dl=4
    //   doc 2: tf=1, dl=22 — diluted, cut by k=3
    val dir = docsDir(Seq(
      (0L, "alpha beta", "s"),
      (1L, "alpha beta x.", "s"),
      (2L, "alpha beta " + (1 to 20).map(i => s"f$i").mkString(" "), "s"),
      (3L, "alpha beta alpha beta", "s"),
      (4L, "alpha beta g1 g2", "s")))
    val got = TextAnalysis.bm25ChunkTopK(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(5))) // (rank, doc, score)
    assert(got.map(t => (t._1, t._2)).toSeq === Seq((1L, 3L), (2L, 1L), (3L, 4L)))
    val score = got.map(t => t._2 -> t._3).toMap
    // saturation: the tf=2 doc beats the same-length tf=1 doc by LESS than 2×
    assert(score(3L) > score(4L) && score(3L) < 2L * score(4L))
  }

  test("dsirScore ranks target-looking docs above junk, flags upweight") {
    // Docs 1,2 pass the keep gate (≥5 tokens, terminal '.') and define
    // the target unigram profile; doc 3 fails it AND uses disjoint
    // vocabulary, so its buckets are raw-only → ratio < 1e6. Doc 4 fails
    // the gate too (no terminal) but reuses the target vocabulary, so it
    // still scores high — DSIR selects on CONTENT, not on the gate.
    val dir = docsDir(Seq(
      (1L, "the quick brown fox jumps high.", "s"),
      (2L, "the quick red fox runs fast.", "s"),
      (3L, "zz qq ww", "s"),
      (4L, "quick fox the brown", "s")))
    val got = Corpus.dsirScore(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    assert(got(1L)._1 === 6L) // n_tokens
    assert(got(3L)._2 < got(4L)._2, "junk vocabulary must score below target vocabulary")
    assert(got(1L)._2 > got(3L)._2)
    // upweight is exactly the >1e6 predicate on the emitted score
    got.values.foreach { case (_, ppm, up) => assert(up === (ppm > 1000000L)) }
  }

  test("tvDrift: identical sources are 0 ppm; disjoint sources are 500000") {
    // a and b have identical unigram distributions → both match the
    // corpus exactly. c and d are disjoint singletons: corpus puts mass
    // 1/2 on each word, each source puts 1 on its own → TV = 1/2.
    val same = docsDir(Seq(
      (1L, "x y", "a"), (2L, "x y", "b")))
    val g1 = Corpus.tvDrift(spark, same).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(g1 === Map("a" -> 0L, "b" -> 0L))

    val disjoint = docsDir(Seq(
      (1L, "x x", "c"), (2L, "y y", "d")))
    val g2 = Corpus.tvDrift(spark, disjoint).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(g2("c") === ((2L, 1L, 500000L)))
    assert(g2("d") === ((2L, 1L, 500000L)))
  }
}
