package graft

import org.apache.spark.sql.functions._
import graft.engine.ext.{Dedup, Similarity}

/** Unit + invariant tests for the dedup and similarity building blocks on
  * small in-memory corpora (the DuckDB oracles cover the full testdata runs;
  * these pin the column-function semantics).
  */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private def strSeq(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
    df.collect().toSeq.map(_.getSeq[String](0))

  test("tokens: lowercases, splits on whitespace runs, drops empties") {
    val got = strSeq(Seq("  Hello\t\tWorld\nfoo ").toDF("t")
      .select(Dedup.tokens(col("t"))))
    assert(got === Seq(Seq("hello", "world", "foo")))
  }

  test("shingles: distinct word 3-grams in order; short docs → empty") {
    val got = strSeq(Seq("a b c d c d", "a b").toDF("t")
      .select(Dedup.shinglesFromTokens(Dedup.tokens(col("t")), 3)))
    assert(got === Seq(Seq("a b c", "b c d", "c d c", "d c d"), Seq()))
  }

  test("md5Hash60/48 are deterministic, positive, and within bit range") {
    val r = Seq("x").toDF("t")
      .select(Dedup.md5Hash60(col("t")), Dedup.md5Hash48(col("t"))).head()
    val (h60, h48) = (r.getLong(0), r.getLong(1))
    assert(h60 > 0 && h60 < (1L << 60))
    assert(h48 > 0 && h48 < (1L << 48))
    val r2 = Seq("x").toDF("t")
      .select(Dedup.md5Hash60(col("t")), Dedup.md5Hash48(col("t"))).head()
    assert(r2.getLong(0) === h60 && r2.getLong(1) === h48)
  }

  test("exact + bow dedup on a toy corpus") {
    val dir = java.nio.file.Files.createTempDirectory("docs").toString
    Seq(
      (1L, "the quick brown fox", "en", "a", 19L),
      (2L, "the quick brown fox", "en", "a", 19L),      // exact dup of 1
      (3L, "fox brown quick the", "en", "a", 19L),      // bow dup of 1, not exact
      (4L, "something else entirely", "en", "a", 23L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val exact = Dedup.exact(spark, dir).collect()
    assert(exact.map(r => r.getAs[Long]("canonical_doc_id") -> r.getAs[Long]("n_copies"))
      .toSeq === Seq(1L -> 2L, 3L -> 1L, 4L -> 1L))

    val bow = Dedup.bagOfWords(spark, dir).collect()
    assert(bow.map(r => r.getAs[Long]("canonical_doc_id") -> r.getAs[Long]("n_copies"))
      .toSeq === Seq(1L -> 3L, 4L -> 1L))
  }

  test("thresholdHist buckets blocked pairs by Jaccard decile") {
    val dir = java.nio.file.Files.createTempDirectory("th").toString
    Seq(
      (1L, "a b c d e f", "en", "s", 11L),
      (2L, "a b c d e f", "en", "s", 11L),   // jaccard 1e6 -> bucket 10
      (3L, "a b c x y z", "en", "s", 11L),   // shares "a b c" with 1,2
      (4L, "unrelated words only here", "en", "s", 25L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.thresholdHist(spark, dir).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("min_ppm"), r.getAs[Long]("max_ppm")))
    // (1,3) and (2,3): 1 shared of 7 distinct -> 142857 ppm, bucket 1;
    // (1,2): identical -> bucket 10
    assert(got.toSeq === Seq(
      (1L, 2L, 142857L, 142857L),
      (10L, 1L, 1000000L, 1000000L)))
  }

  test("ngram Jaccard pairs: near-dup found, jaccard in [0, 1e6], symmetric blocking") {
    val dir = java.nio.file.Files.createTempDirectory("docs2").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    Seq(
      (1L, base, "en", "a", 1L),
      (2L, base + " iota", "en", "a", 1L), // near dup
      (3L, "totally different words with no overlap at all", "en", "a", 1L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val pairs = Dedup.ngramJaccardPairs(
      spark.read.parquet(s"$dir/documents.parquet"), minJaccardPpm = 1L).collect()
    assert(pairs.length === 1)
    val p = pairs(0)
    assert(p.getAs[Long]("doc_a") === 1L && p.getAs[Long]("doc_b") === 2L)
    val j = p.getAs[Long]("jaccard_ppm")
    // |shingles(1)| = 6, |shingles(2)| = 7, shared = 6 → 6/7 ≈ 857142 ppm
    assert(j === 6L * 1000000L / 7L)
  }

  test("simhash: identical docs get identical signatures; pairs find them") {
    val dir = java.nio.file.Files.createTempDirectory("docs3").toString
    Seq(
      (1L, "one two three four five six seven eight", "en", "a", 1L),
      (2L, "one two three four five six seven eight", "en", "a", 1L),
      (3L, "nine ten eleven twelve thirteen fourteen fifteen", "en", "a", 1L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val sig = Dedup.simhash(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sig(1L) === sig(2L))
    assert(sig(1L) !== sig(3L))
    assert(sig.values.forall(s => s >= 0 && s < (1L << 60)))

    val pairs = Dedup.simhashPairs(spark, dir).collect()
    assert(pairs.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
      r.getAs[Long]("hamming"))).toSeq === Seq((1L, 2L, 0L)))
  }

  test("simhashSig: width-parameterized geometry — default recombines to " +
    "the 60-bit long, a wide build matches its brute-force replay") {
    val docs = (0L until 40L).map { i =>
      // 8-token docs; every 4th doc is a near-dup of doc i-1 (one token
      // swapped) so both geometries have real pairs to find
      val base = (0 until 8).map(t => s"w${(i / 4) * 8 + t}")
      val txt = if (i % 4 == 3) (base.dropRight(1) :+ "swapped").mkString(" ")
      else base.mkString(" ")
      (i, txt, "en", "a", txt.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

    // default geometry: sig array recombines to EXACTLY the single-long
    // signature (the bit layout the committed artifacts were built on)
    val recombined = Dedup.simhashSig(docs)
      .select(col("doc_id"), (0 until 4).map(b =>
        shiftleft(element_at(col("sig"), b + 1), b * 15)).reduce(_ + _)
        .as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val single = Dedup.simhash(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(recombined === single)

    // non-default 4 x 30 = 120-bit build (the >4M-doc geometry from the
    // knob audit): the banded pair list must equal its definition — all
    // pairs sharing >= 1 exact band value with total Hamming <= max
    val wideSig = Dedup.simhashSig(docs, bands = 4, bitsPerBand = 30)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val maxHamming = 8
    val expected = (for {
      a <- wideSig.keys; b <- wideSig.keys if a < b
      sa = wideSig(a); sb = wideSig(b)
      if sa.zip(sb).exists { case (x, y) => x == y }
      h = sa.zip(sb).map { case (x, y) =>
        java.lang.Long.bitCount(x ^ y) }.sum
      if h <= maxHamming
    } yield (a, b, h)).toSeq.sorted
    val got = Dedup.simhashPairs(docs, maxHamming, bands = 4, bitsPerBand = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got === expected)
    assert(got.nonEmpty) // the fixture actually exercises the wide path
    // wide signatures use bits >= 60 (the regime a single long cannot hold)
    assert(wideSig.values.exists(_.exists(_ >= (1L << 15))))

    // geometry validation: per-band width and the two-md5-halves budget
    intercept[IllegalArgumentException](Dedup.simhashSig(docs, 4, 61))
    intercept[IllegalArgumentException](Dedup.simhashSig(docs, 3, 41))
    intercept[IllegalArgumentException](Dedup.simhashSig(docs, 0, 15))
  }

  test("pHashSigs: default geometry recombines to the single-long pHash; " +
    "wide geometry samples more points") {
    import graft.engine.ext.Multimodal
    val dir = java.nio.file.Files.createTempDirectory("media1").toString
    (0L until 20L).map { i =>
      val txt = ("x" * 40) + ("abcdefgh" * (1 + (i % 5)).toInt) + i.toString
      (i, txt, "en", "a", txt.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val recombined = Multimodal.pHashSigs(spark, dir).toDF()
      .select(col("doc_id"), (0 until 4).map(b =>
        shiftleft(element_at(col("sig"), b + 1), b * 15)).reduce(_ + _)
        .as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val single = Multimodal.pHashes(spark, dir).toDF()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(recombined === single)

    // a 4 x 30 build thresholds 120 sampled points — band values reach
    // the bit range a single signed long could not have carried
    val wide = Multimodal.pHashSigs(spark, dir, bands = 4, bitsPerBand = 30)
      .collect()
    assert(wide.forall(_.sig.length == 4))
    assert(wide.exists(_.sig.exists(_ >= (1L << 15))))
    intercept[IllegalArgumentException](
      Multimodal.pHashSigs(spark, dir, 4, 61).toDF().collect())
  }

  test("derive sentinels (r13): bitsPerBand = 0 / maxHamming = -1 reproduce " +
    "the pinned historical geometry below the 65k floor") {
    val docs = (0L until 30L).map { i =>
      val base = (0 until 8).map(t => s"w${(i / 3) * 8 + t}")
      val txt = if (i % 3 == 2) (base.dropRight(1) :+ "sw").mkString(" ")
      else base.mkString(" ")
      (i, txt, "en", "a", txt.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    // sentinel call == fully pinned call at the fixture's scale (the
    // derivation floors at 15 bits / threshold 8 below 65k docs)
    val derived = Dedup.simhashPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val pinned = Dedup.simhashPairs(docs, maxHamming = 8, bands = 4,
      bitsPerBand = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(derived === pinned)
    assert(derived.nonEmpty)

    // the registered triangle census is the derived-cap census; at this
    // scale the cap (32·⌈log2 n⌉ ≥ 32) clears every degree, so it equals
    // the exact census — the capped semantics themselves are pinned by
    // the maxDegree=3 test below
    val dir = java.nio.file.Files.createTempDirectory("docs_tri").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val reg = Dedup.triangles(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val exact = Dedup.trianglesFromPairs(Dedup.simhashPairs(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(reg === exact)
    assert(reg.nonEmpty)

    // pHash sentinel: same floor, same pair list as the pinned call
    import graft.engine.ext.Multimodal
    val derivedP = Multimodal.phashPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val pinnedP = Multimodal.phashPairs(spark, dir, maxHamming = 8,
      bands = 4, bitsPerBand = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(derivedP === pinnedP)
  }

  test("bandedHammingPairs streamed expansion matches the brute-force " +
    "definition on a dense exact-dup family") {
    // a 12-member exact-dup family forces buckets of 12 in every band —
    // the streamed two-level explode must emit exactly the pairs the
    // all-pairs definition yields (sharing >= 1 band value, Hamming <= 8)
    val docs = ((0L until 12L).map(i => (i, "alpha beta gamma delta " +
      "epsilon zeta eta theta")) ++
      (12L until 40L).map(i => (i, (0 until 8).map(t => s"u${i}_$t")
        .mkString(" "))))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("a").as("source"), length(col("text")).cast("long").as("n_chars"))
    val sig = Dedup.simhashSig(docs, 4, 15)
    val sigs = sig.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val expected = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      sa = sigs(a); sb = sigs(b)
      if sa.zip(sb).exists { case (x, y) => x == y }
      h = sa.zip(sb).map { case (x, y) =>
        java.lang.Long.bitCount(x ^ y) }.sum
      if h <= 8
    } yield (a, b, h.toString)).toSeq.sorted
    val got = Dedup.bandedHammingPairs(sig, 4, 15, 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.get(2).toString)).toSeq
    assert(got === expected)
    assert(got.size >= 66) // C(12,2) family pairs all present

    // family cap (r14): a cap below the family size excludes its buckets
    // from pair generation entirely (that mass belongs to exact dedup);
    // the derived cap (64·⌈log2 n⌉ ≫ 12 here) changes nothing
    val capped = Dedup.bandedHammingPairs(sig, 4, 15, 8, bucketCap = 11L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.forall { case (a, b) => a >= 12L || b >= 12L },
      "family pairs must be excluded under the cap")
    val derived = Dedup.simhashPairs(docs, bitsPerBand = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2).toString)).toSeq
    assert(derived === got)
  }

  test("bucketAudit: per-band census counts the family bucket and flags " +
    "it only past the cap") {
    val docs = ((0L until 10L).map(i => (i, "alpha beta gamma delta " +
      "epsilon zeta eta theta")) ++
      (10L until 30L).map(i => (i, (0 until 8).map(t => s"v${i}_$t")
        .mkString(" "))))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("a").as("source"), length(col("text")).cast("long").as("n_chars"))
    val audit = Dedup.bucketAudit(docs).collect()
    assert(audit.length === 4)
    audit.foreach { r =>
      assert(r.getAs[Long]("max_bucket") >= 10L) // the exact-dup family
      assert(r.getAs[Long]("n_multi") >= 1L)
      assert(r.getAs[Long]("bucket_cap") ===
        graft.engine.ext.ScaleKnobs.hammingBucketCap(30L))
      assert(r.getAs[Long]("n_over_cap") === 0L) // derived cap ≫ family
    }
  }

  test("minhash pairs: exact dups estimate 1e6 ppm; estimates bounded") {
    val dir = java.nio.file.Files.createTempDirectory("docs4").toString
    Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", "en", "a", 1L),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", "en", "a", 1L),
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10", "en", "a", 1L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val pairs = Dedup.minhashPairs(
      spark.read.parquet(s"$dir/documents.parquet"), minEstPpm = 1L).collect()
    val dup = pairs.find(r => r.getAs[Long]("doc_a") == 1L &&
      r.getAs[Long]("doc_b") == 2L)
    assert(dup.isDefined)
    assert(dup.get.getAs[Long]("est_jaccard_ppm") === 1000000L)
    assert(pairs.forall { r =>
      val e = r.getAs[Long]("est_jaccard_ppm"); e >= 0L && e <= 1000000L
    })
    // disjoint docs must not pair with estimate 1e6
    assert(!pairs.exists(r => r.getAs[Long]("doc_b") == 3L &&
      r.getAs[Long]("est_jaccard_ppm") == 1000000L))
  }

  test("trianglesFromPairs maxDegree cap: hubs keep their degree but are " +
    "excluded from wedge formation") {
    // clique {1..5} (degree 4 each) + triangle {10,11,12} (degree 2 each)
    val k5 = for { a <- 1L to 5L; b <- (a + 1) to 5L } yield (a, b)
    val k3 = Seq((10L, 11L), (10L, 12L), (11L, 12L))
    val pairs = (k5 ++ k3).toDF("doc_a", "doc_b")
    val exact = Dedup.trianglesFromPairs(pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(exact(1L) === ((4L, 6L))) // C(4,2) = 6 triangles per K5 member
    assert(exact(10L) === ((2L, 1L)))
    val capped = Dedup.trianglesFromPairs(pairs, maxDegree = 3L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // K5 members: true degree reported, zero surviving wedges
    assert(capped(1L) === ((4L, 0L)))
    // the small clique is untouched
    assert(capped(10L) === ((2L, 1L)))
  }

  test("connectedComponents: reliable-checkpoint mode (spark.graft." +
    "checkpointDir) writes round state to the configured dir, same labels") {
    val ckDir = java.nio.file.Files.createTempDirectory("graftck").toString
    val vertices = (1L to 12L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (7L, 8L))
      .toDF("doc_a", "doc_b")
    val local = Dedup.connectedComponents(vertices, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.conf.set(Dedup.CheckpointDirConf, ckDir)
    try {
      val reliable = Dedup.connectedComponents(vertices, edges).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reliable === local)
      // round state actually went to the reliable dir (rdd-* checkpoint
      // dirs with part files), not executor blocks
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(ckDir))
        .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      var sawRdd = false
      while (files.hasNext) {
        if (files.next().getFileName.toString.startsWith("rdd-")) sawRdd = true
      }
      assert(sawRdd, s"no rdd-* checkpoint dirs under $ckDir")
      // pagerank rides the same switch
      val pr = Dedup.pagerankFromPairs(vertices, edges, iters = 2).collect()
      assert(pr.length === 12)
    } finally spark.conf.unset(Dedup.CheckpointDirConf)
  }

  test("connectedComponents: chain propagates min label over >1 iteration") {
    // chain 1-2-3-4 plus isolated 9: all chain members label 1
    val vertices = Seq(1L, 2L, 3L, 4L, 9L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(vertices, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 9L -> 9L))
  }

  test("connectedComponents: 600-vertex shuffled-id path converges within " +
       "the default round cap") {
    // A long path whose ids are RANDOMLY permuted along it — the shape
    // min-label propagation needed 25+ rounds on (the sf1 SRP graph's
    // failure mode) and the star contraction finishes in O(log n). The
    // default maxIter throws rather than under-merging, so a pass here
    // certifies both convergence speed and correctness.
    val ids = new scala.util.Random(7).shuffle((1L to 600L).toVector)
    val vertices = ids.toDF("doc_id")
    val edges = ids.sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(vertices, edges).collect()
    assert(got.length === 600)
    assert(got.forall(_.getLong(1) === 1L)) // one component, min id 1
  }

  test("connectedComponents: refuses to return unconverged labels") {
    val ids = new scala.util.Random(11).shuffle((1L to 400L).toVector)
    val vertices = ids.toDF("doc_id")
    val edges = ids.sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("doc_a", "doc_b")
    val ex = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(vertices, edges, maxIter = 1).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("connectedComponents: empty edge set labels every vertex itself") {
    val vertices = Seq(3L, 5L, 8L).toDF("doc_id")
    val edges = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(vertices, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(3L -> 3L, 5L -> 5L, 8L -> 8L))
  }

  test("quantize + qdot: exact integer dot product") {
    graft.engine.expr.NativeFunctions.ensureRegistered(spark)
    val r = Seq((Seq(1.0f, 0.5f, -0.25f), Seq(2.0f, 1.0f, 4.0f)))
      .toDF("a", "b")
      .select(Similarity.qdot(Similarity.quantize(col("a")),
        Similarity.quantize(col("b"))).as("d"))
      .head()
    // floor(1*1000)*floor(2*1000) + floor(.5*1000)*floor(1*1000)
    //   + floor(-.25*1000)*floor(4*1000)
    assert(r.getLong(0) === 1000L * 2000 + 500L * 1000 + (-250L) * 4000)
  }

  test("native qdot expression matches the declarative form") {
    graft.engine.expr.NativeFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(50)((
      Seq.fill(64)(rnd.nextFloat() * 2 - 1),
      Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .select(Similarity.quantize(col("a")).as("qa"),
        Similarity.quantize(col("b")).as("qb"))
      .select(
        Similarity.qdot(col("qa"), col("qb")).as("native"),
        Similarity.qdotDeclarative(col("qa"), col("qb")).as("declarative"))
    df.collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("bruteForceTopK: self excluded, ranks ordered by dot desc") {
    val dir = java.nio.file.Files.createTempDirectory("emb").toString
    val vecs = Seq(
      (0L, Seq.fill(64)(1.0f), 0),
      (1L, Seq.fill(64)(0.9f), 0),
      (2L, Seq.fill(64)(0.1f), 1),
      (3L, Seq.fill(64)(-1.0f), 1),
    )
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val top = Similarity.bruteForceTopK(spark, dir, k = 3, queryMod = 4).collect()
    // only vec 0 is a query (0 % 4 == 0); neighbors by dot: 1 > 2 > 3
    assert(top.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(1L, 2L, 3L))
    assert(top.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2, 3))
    val dots = top.map(_.getAs[Long]("dot"))
    assert(dots.sameElements(dots.sortBy(-_)))
  }

  test("semantic clusters group parallel vectors, canonical is the min-id member") {
    // 0 and 1 are near-parallel (cosine ≈ 1), 2 is orthogonal-ish, 3 is
    // anti-parallel: expect cluster {0, 1} with 0 canonical, 2 and 3
    // singletons (cosine threshold is 2/5)
    val emb = Seq(
      (0L, Seq.fill(64)(1.0f), 0),
      (1L, Seq.fill(64)(0.9f), 0),
      (2L, (Seq.fill(32)(1.0f) ++ Seq.fill(32)(-1.0f)), 1),
      (3L, Seq.fill(64)(-1.0f), 1),
    ).toDF("vec_id", "embedding", "label")
    val got = Dedup.semanticClusters(spark, emb).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("cluster_size"), r.getAs[Boolean]("keep")))
    assert(got.toSeq === Seq(
      (0L, 0L, 2L, true), (1L, 0L, 2L, false),
      (2L, 2L, 1L, true), (3L, 3L, 1L, true)))
  }

  test("embedCosinePairs default derives its plane count from the corpus") {
    // 2,100 vectors cross the 2^11 occupancy boundary: the derived width
    // is 5 bits/band (20 planes), one past the historical fixed 16 — the
    // r10-verdict fix for the n-squared fixed-bucket config. The default
    // call must equal an explicit pin of the derived value (same buckets,
    // same pairs), proving the sizing rule is the code path, not scaladoc.
    assert(graft.engine.ext.ScaleKnobs.srpPlanes(2100L) === 20)
    val emb = spark.range(2100)
      .selectExpr("id AS vec_id",
        // deterministic pseudo-embedding: 21 near-duplicate families of
        // 100 vectors each (id % 21 seeds the direction, id // 21 jitters)
        """transform(sequence(1, 64),
           i -> cast(1.0 + 0.001 * ((id % 21) * 37 + i * (id % 21)) % 3
                     + 0.0001 * (id div 21) as float)) AS embedding""",
        "cast(id % 3 as int) AS label")
    val dflt = Dedup.embedCosinePairs(spark, emb).collect()
    val pinned = Dedup.embedCosinePairs(spark, emb, nPlanes = 20).collect()
    assert(dflt.nonEmpty)
    assert(dflt.map(_.toString).toSeq === pinned.map(_.toString).toSeq)
  }

  test("containment catches a quoted subset that Jaccard misses") {
    // doc 2 quotes doc 1 verbatim inside 4× more surrounding text:
    // Jaccard ≈ 1/4 (under the 0.5 a dup filter would use), containment ≈ 1
    val quote = (1 to 8).map(i => s"quoted$i").mkString(" ")
    val filler = (1 to 24).map(i => s"filler$i").mkString(" ")
    val docs = Seq(
      (1L, quote),
      (2L, s"$filler $quote"),
      (3L, "unrelated words entirely different content here"),
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, n = 3, dfCap = 100,
      minContainPpm = 900000L).collect()
    assert(cont.length === 1)
    assert(cont(0).getAs[Long]("doc_a") === 1L)
    assert(cont(0).getAs[Long]("doc_b") === 2L)
    assert(cont(0).getAs[Long]("containment_ppm") === 1000000L)
    // the same pair is BELOW a 50% Jaccard gate — the asymmetry is real
    val jac = Dedup.ngramJaccardPairs(docs, n = 3, dfCap = 100,
      minJaccardPpm = 0L).collect()
      .filter(r => r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(jac.length === 1)
    assert(jac(0).getAs[Long]("jaccard_ppm") < 500000L)
  }

  test("substring spans: exact boundaries, maximal runs, two islands stay separate") {
    // doc 2 embeds tokens 2..13 of doc 1 (a 12-token span) at offset 5,
    // and ALSO tokens 20..27 (8 tokens) at offset 30 — two disjoint
    // diagonals. With minSpanTokens=8 both spans surface, with exact
    // starts; with minSpanTokens=10 only the long one survives.
    val t1 = (0 until 40).map(i => s"w$i")
    val fillerA = (0 until 5).map(i => s"fa$i")
    val fillerB = (0 until 13).map(i => s"fb$i") // pads to offset 30
    val t2 = fillerA ++ t1.slice(2, 14) ++ fillerB ++ t1.slice(20, 28)
    val docs = Seq(
      (1L, t1.mkString(" ")),
      (2L, t2.mkString(" ")),
      (3L, "zz yy xx ww vv uu tt ss rr qq"),
    ).toDF("doc_id", "text")

    val both = Dedup.substringSpans(docs, n = 3, dfCap = 100,
      minSpanTokens = 8).collect()
    assert(both.length === 2, both.mkString("; "))
    val long = both(0)
    assert(long.getAs[Long]("a_start") === 2L)
    assert(long.getAs[Long]("b_start") === 5L)
    assert(long.getAs[Long]("span_tokens") === 12L)
    val shortSpan = both(1)
    assert(shortSpan.getAs[Long]("a_start") === 20L)
    assert(shortSpan.getAs[Long]("b_start") === 30L)
    assert(shortSpan.getAs[Long]("span_tokens") === 8L)

    val onlyLong = Dedup.substringSpans(docs, n = 3, dfCap = 100,
      minSpanTokens = 10).collect()
    assert(onlyLong.length === 1)
    assert(onlyLong(0).getAs[Long]("span_tokens") === 12L)

    // whole-doc Jaccard on the same pair is far below a dup gate — the
    // span detector sees what set-similarity can't
    val jac = Dedup.ngramJaccardPairs(docs, n = 3, dfCap = 100,
      minJaccardPpm = 0L).collect()
      .filter(r => r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(jac.forall(_.getAs[Long]("jaccard_ppm") < 500000L))
  }

  test("span coverage: interval union merges overlaps, ppm is exact integer div") {
    // doc 1 = w0..w39. doc 2 embeds w2..w13 at offset 5 and w20..w27 at
    // offset 30. doc 4 = w0..w14 — overlapping doc 1 on [0,15) while
    // doc 2's shared region gives doc 1 [2,14): the union must merge.
    val t1 = (0 until 40).map(i => s"w$i")
    val t2 = (0 until 5).map(i => s"fa$i") ++ t1.slice(2, 14) ++
      (0 until 13).map(i => s"fb$i") ++ t1.slice(20, 28)
    val docs = Seq(
      (1L, t1.mkString(" ")),
      (2L, t2.mkString(" ")),
      (3L, "zz yy xx ww vv uu tt ss rr qq"),
      (4L, t1.slice(0, 15).mkString(" ")),
    ).toDF("doc_id", "text")

    val cov = Dedup.spanCoverage(docs, n = 3, dfCap = 100,
      minSpanTokens = 8).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("covered_tokens"),
          r.getAs[Long]("n_spans"), r.getAs[Long]("dup_ppm")))).toMap
    // doc 1: [0,15) ∪ [2,14) ∪ [20,28) → 15 + 8 = 23 over two islands
    assert(cov(1L) === ((40L, 23L, 2L, 575000L)), cov.toString)
    // doc 2: [5,17) (twice, deduped) ∪ [30,38) → 20; 20e6 div 38
    assert(cov(2L) === ((38L, 20L, 2L, 526315L)), cov.toString)
    // doc 4: [0,15) ∪ [2,14) merge into ONE island covering everything
    assert(cov(4L) === ((15L, 15L, 1L, 1000000L)), cov.toString)
    assert(!cov.contains(3L))
  }

  test("canonical selection: the quality gate outranks length, survivor census exact") {
    // docs 1/2 are near-identical (one token apart → SimHash-paired):
    // doc 1 is LONGER but fails the gate (no terminal punctuation),
    // doc 2 is shorter but kept → 2 must be canonical. doc 3 is a
    // singleton and must not appear.
    val base = (1 to 30).map(i => s"word$i").mkString(" ")
    val rows = Seq(
      (1L, s"$base trailing extra"),  // no terminal punct → dropped
      (2L, s"$base."),                // kept
      (3L, "a completely different singleton document."))
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
    val docs = rows.toDF("doc_id", "text", "lang", "source", "n_chars")

    val got = Dedup.canonicalByQuality(docs).collect()
    assert(got.length === 1, got.mkString("; "))
    val r = got(0)
    assert(r.getAs[Long]("cluster_id") === 1L)
    assert(r.getAs[Long]("n_members") === 2L)
    assert(r.getAs[Long]("n_kept") === 1L)
    assert(r.getAs[Long]("canonical_doc_id") === 2L)
    assert(r.getAs[Boolean]("canonical_kept"))
    // sanity: doc 1 IS longer — length alone would have picked it
    assert(rows(0)._5 > rows(1)._5)
  }

  test("pagerank: near-dup cluster members outrank isolated docs, center outranks leaves") {
    // 1,2,3 near-identical (a clique in the simhash graph); 4 isolated
    val base = (1 to 40).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base + " extra"),
      (3L, base + " other"),
      (4L, "completely different content with nothing shared at all"),
    ).toDF("doc_id", "text")
    val pr = Dedup.pagerank(docs, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // isolated doc keeps the damping floor; clique members accumulate
    assert(pr(4L) === 150000L, pr.toString)
    assert(Seq(1L, 2L, 3L).forall(pr(_) > 150000L), pr.toString)
  }

  test("pagerank: loop invariants are checkpointed — no pair-gen lineage in the result") {
    // Regression lock for the r6 plan defect: edges/deg/ranks must be
    // materialized (localCheckpoint → LogicalRDD), so the returned plan
    // is a sort over a scan, NOT a replay of the SimHash shingle-explode
    // pipeline for every downstream action/iteration.
    val base = (1 to 40).map(i => s"word$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base + " x")).toDF("doc_id", "text")
    val plan = Dedup.pagerank(docs, iters = 2)
      .queryExecution.optimizedPlan
    val hasGenerate = plan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }.nonEmpty
    assert(!hasGenerate,
      s"pagerank result re-plans pair generation:\n$plan")
    val isCheckpointed = plan.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD])
    assert(isCheckpointed, s"expected only checkpointed leaves:\n$plan")
  }

  test("clusterSizeHist partitions the corpus: sum of n_docs equals doc count") {
    val dir = "/root/testdata/sf0.001"
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    val r = Dedup.clusterSizeHist(spark, dir).collect()
    assert(r.map(_.getAs[Long]("n_docs")).sum === total)
    r.foreach { row =>
      assert(row.getAs[Long]("n_docs") ===
        row.getAs[Long]("cluster_size") * row.getAs[Long]("n_clusters"))
    }
    assert(r.map(_.getAs[Long]("cluster_size")).contains(1L)) // unique docs exist
  }

  test("sourceOverlap: shared-shingle pairs exact, non-overlapping sources absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "w1 w2 w3 w4", "srcA"), // shingles {w1 w2 w3, w2 w3 w4}
      (2L, "w1 w2 w3", "srcB"),    // shingles {w1 w2 w3}
      (3L, "p q r", "srcC"))       // disjoint from both
      .toDF("doc_id", "text", "source")
    val got = Dedup.sourceOverlap(docs).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b"),
        r.getAs[Long]("shared_shingles"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Long]("jaccard_ppm")))
    // only the overlapping pair appears; jaccard = 1 / (2 + 1 - 1)
    assert(got.toSeq === Seq(("srcA", "srcB", 1L, 2L, 1L, 500000L)))
  }

  test("incremental dedup classifies batch docs against a corpus snapshot") {
    import spark.implicits._
    def docs(rows: (Long, String)*) =
      rows.toDF("doc_id", "text")
    val corpus = docs(1L -> "alpha", 2L -> "beta")
    val batch = docs(
      10L -> "alpha",  // already in corpus
      11L -> "gamma",  // genuinely new
      12L -> "gamma",  // dup of 11 within the batch
      13L -> "delta")
    val got = Dedup.incremental(corpus, batch)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("status"),
        r.getAs[Long]("canonical_doc_id")))
    assert(got.toSeq === Seq(
      (10L, "dup_of_corpus", 1L),
      (11L, "new", 11L),
      (12L, "dup_in_batch", 11L),
      (13L, "new", 13L)))
  }

  test("shingleAudit harvest (observe on the T0 build) equals the " +
    "standalone census — pins that the df-cap filter is NOT pushed " +
    "below CollectMetrics") {
    val dir = java.nio.file.Files.createTempDirectory("sa").toString
    // corpus with singleton shingles (df=1), shared shingles (df=2) and
    // a >2 family, so every census bucket class is populated — if
    // Catalyst pushed the [2, cap] filter below the observe point, the
    // harvested n_shingles/max_df would miss the singletons and diverge
    // from the standalone pipeline
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", "a", 43L),
      (2L, "the quick brown fox jumps over a sleeping cat", "en", "a", 46L),
      (3L, "the quick brown fox jumps over the lazy dog", "en", "b", 43L),
      (4L, "entirely different words about spacecraft engines", "en", "b", 50L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.engine.StageCache.clear(spark)
    val harvested = Dedup.shingleAudit(spark, dir).collect()
    val standalone =
      Dedup.shingleAudit(spark.read.parquet(s"$dir/documents.parquet"))
        .collect()
    assert(harvested.length === 1 && standalone.length === 1)
    assert(harvested.head === standalone.head)
    // and the harvest actually saw singletons: docs 1/3 are exact dups,
    // doc 4 contributes singleton shingles only
    assert(harvested.head.getAs[Long]("max_df") >= 2L)
    assert(harvested.head.getAs[Long]("n_shingles") >
      harvested.head.getAs[Long]("n_buckets"))
    graft.engine.StageCache.clear(spark)
  }
}
