package graft

import org.apache.spark.sql.functions._

import graft.engine.ext.{Dedup, TextAnalysis}

/** Karp-Rabin winnowing fingerprint (r15 rebuild): the native rolling
  * expression must be VALUE-identical to an independent naive
  * per-window fold (BigInt arithmetic — no shared mulmod code), and the
  * operator semantics (min fingerprint, distinct window count, cluster
  * grouping) must survive the md5 → Karp-Rabin switch.
  */
class WinnowSpec extends SparkTestBase {
  import spark.implicits._

  private val M = BigInt("2305843009213693951") // 2^61 - 1
  private val B = BigInt(257)

  /** Independent reference: hash every window by a fresh left fold in
    * BigInt arithmetic; the engine's O(1) rolling update must agree on
    * every window, not just the min.
    */
  private def refHashes(text: String, w: Int): Seq[Long] = {
    val cps = text.codePoints().toArray.toSeq
    val windows =
      if (cps.length <= w) Seq(cps)
      else cps.sliding(w).toSeq
    windows.map(win =>
      win.foldLeft(BigInt(0))((h, c) => (h * B + c) mod M).toLong)
  }

  private val texts = Seq(
    "",                                      // empty: single window, hash 0
    "short",                                 // below w: one whole-text window
    "exactly sixteen!",                      // exactly w = one window
    "exactly sixteen!!",                     // w + 1 = two windows
    "The quick brown fox jumps over the lazy dog",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",        // all windows identical
    "abcabcabcabcabcabcabcabcabcabc",        // period-3 repetition
    "漢字テスト 𠀀𠀁 mixed ascii and 中文 text here", // supplementary plane
    "x" * 15 + "Y" + "x" * 15)               // one distinguishing char

  test("rolling Karp-Rabin equals the naive per-window fold (min AND " +
    "distinct count), including empty/short/supplementary-plane texts") {
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.winnowFingerprint(d).orderBy("doc_id").collect()
    texts.zipWithIndex.foreach { case (t, i) =>
      val hs = refHashes(t, 16)
      val r = got(i)
      assert(r.getLong(1) === hs.min, s"fingerprint @ doc $i")
      assert(r.getInt(2) === hs.distinct.size, s"n_distinct @ doc $i")
    }
  }

  test("identical docs share the fingerprint; a one-char edit far from " +
    "the min window usually keeps it (winnowing locality)") {
    val base = "All work and no play makes Jack a dull boy. " * 5
    val d = Seq(
      (0L, base), (1L, base),
      (2L, base + " trailing-edit")).toDF("doc_id", "text")
    val fp = TextAnalysis.winnowFingerprint(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) === fp(1L))
    // the trailing edit only ADDS windows; the min over a superset can
    // only move down, and equals when the new windows hash higher
    val hs = refHashes(base, 16)
    val hs2 = refHashes(base + " trailing-edit", 16)
    assert(fp(2L) === hs2.min)
    assert(hs2.take(hs.size) === hs)
  }

  test("winnowClusters groups multi-doc fingerprint collisions with the " +
    "min doc as canonical") {
    val base = "Duplicate detection corpus text, long enough for windows."
    val d = Seq((5L, base), (9L, base), (2L, "something else entirely here"))
      .toDF("doc_id", "text")
    // the (spark, dir) registry form needs a corpus dir; exercise the
    // same chain ([[Dedup.winnowClusters]]'s body) over the fixture
    val got = TextAnalysis.winnowFingerprint(d)
      .groupBy(col("fingerprint_h"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_doc_id"))
      .filter(col("n_docs") >= 2).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("canonical_doc_id") === 5L)
    assert(got.head.getAs[Long]("n_docs") === 2L)
  }
}
