package graft

import org.apache.spark.sql.functions._
import graft.engine.ext.TextAnalysis

/** Round-6 text quality signals: Gopher-style repetition fractions,
  * unigram surprisal, PII redaction — value-level checks on controlled
  * fixtures (the DuckDB oracle covers the full corpus separately).
  */
class TextSignalsSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, "en", "a", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("repetition: top-word and duplicate-2-gram fractions, exact ppm") {
    val d = docs(
      1L -> "a a a a b",         // top word 4/5
      2L -> "x y x y x y",       // bigrams: 5 total, 2 distinct
      3L -> "one two three four five")
    val r = TextAnalysis.repetition(d).orderBy("doc_id").collect()
    val r1 = r(0)
    assert(r1.getAs[Long]("n_words") === 5L)
    assert(r1.getAs[Long]("n_distinct_words") === 2L)
    assert(r1.getAs[Long]("top_word_cnt") === 4L)
    assert(r1.getAs[Long]("top_word_ppm") === 800000L)
    assert(r1.getAs[Long]("dup_word_ppm") === 600000L)
    assert(r1.getAs[Boolean]("repetitive"))
    val r2 = r(1)
    assert(r2.getAs[Long]("dup_2gram_ppm") === 600000L) // (5-2)/5
    assert(r2.getAs[Boolean]("repetitive"))
    val r3 = r(2)
    assert(r3.getAs[Long]("dup_word_ppm") === 0L)
    assert(r3.getAs[Long]("dup_2gram_ppm") === 0L)
    assert(!r3.getAs[Boolean]("repetitive"))
  }

  test("surprisal: rare words score higher; integer-exact values") {
    // corpus: "common" x4, "rare" x1, "mid" x2 -> N = 7
    val d = docs(
      1L -> "common common common",
      2L -> "common rare",
      3L -> "mid mid")
    val r = TextAnalysis.surprisal(d).orderBy("doc_id").collect()
    // weights: common = 1e6*7/4 = 1750000, rare = 7000000, mid = 3500000
    assert(r(0).getAs[Long]("surprisal") === 3 * 1750000L)
    assert(r(1).getAs[Long]("surprisal") === 1750000L + 7000000L)
    assert(r(2).getAs[Long]("surprisal") === 2 * 3500000L)
    assert(r(1).getAs[Long]("surprisal_per_word") === (1750000L + 7000000L) / 2)
    // the rare-word doc is the most surprising per word
    val perWord = r.map(_.getAs[Long]("surprisal_per_word"))
    assert(perWord(1) === perWord.max)
  }

  test("bigram surprisal: rare CONTINUATIONS score higher than common ones") {
    // corpus bigrams starting 'a': "a b" ×2, "a c" ×1 → cnt(a·) = 3.
    // doc 3's "a c" is the rare continuation: 1e6·3/1 = 3,000,000 vs
    // doc 1/2's "a b" at 1e6·3/2 = 1,500,000 — same words, the ORDER
    // carries the signal
    val d = docs(1L -> "a b", 2L -> "a b", 3L -> "a c")
    val r = TextAnalysis.bigramSurprisal(d).orderBy("doc_id").collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("n_bigrams"),
        x.getAs[Long]("surprisal"), x.getAs[Long]("surprisal_per_bigram")))
    assert(r.toSeq === Seq(
      (1L, 1L, 1500000L, 1500000L),
      (2L, 1L, 1500000L, 1500000L),
      (3L, 1L, 3000000L, 3000000L)))
  }

  test("rag chunks: the phrase's CHUNK surfaces with its start_token, not just the doc") {
    // doc 0 (a query: 0 % 50 == 0) asks for "alpha beta"; doc 1 hides it
    // at tokens 35-36, which only chunk 1 (tokens 25-56) covers — chunk 0
    // (tokens 1-32) must not match
    val filler = (1 to 40).map(i => if (i == 35) "alpha" else if (i == 36) "beta"
      else s"w$i").mkString(" ")
    val d = docs(0L -> "alpha beta gamma", 1L -> filler)
    val r = TextAnalysis.ragChunkTopK(d).collect()
      .map(x => (x.getAs[Long]("query_id"), x.getAs[Long]("rank"),
        x.getAs[Long]("doc_id"), x.getAs[Long]("chunk_no"),
        x.getAs[Long]("start_token")))
    assert(r.toSeq === Seq((0L, 1L, 1L, 1L, 25L)))
  }

  test("vocab: corpus top-k by total count with document frequency") {
    val d = docs(
      1L -> "apple apple banana",
      2L -> "apple cherry",
      3L -> "banana apple")
    val v = TextAnalysis.vocab(d, k = 2).collect()
    // apple: tf 4 df 3; banana: tf 2 df 2; cherry cut by k
    assert(v.map(_.getAs[String]("term")).toSeq === Seq("apple", "banana"))
    assert(v.map(_.getAs[Long]("tf")).toSeq === Seq(4L, 2L))
    assert(v.map(_.getAs[Long]("df")).toSeq === Seq(3L, 2L))
    assert(v.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L))
  }

  test("ngramCensus: occurrence counts (not doc counts), rank ties by gram") {
    val d = docs(1L -> "a b c a b c a b c")
    // 7 positional trigrams: "a b c"×3, "b c a"×2, "c a b"×2
    val got = TextAnalysis.ngramCensus(d, 2).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("rank"),
        r.getAs[String]("gram"), r.getAs[Long]("n")))
    assert(got.toSeq === Seq(
      ("en", 1L, "a b c", 3L),
      ("en", 2L, "b c a", 2L))) // beats "c a b" on the gram tiebreak
  }

  test("readability: ratio-of-sums milli components per source") {
    import spark.implicits._
    val d = Seq(
      (1L, "One two three. Four five!", "en", "a"), // 5 words, 2 sentences
      (2L, "Six seven.", "en", "a"))                // 2 words, 1 sentence
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val r = TextAnalysis.readability(d).collect().head
    assert(r.getAs[Long]("n_docs") === 2L)
    assert(r.getAs[Long]("n_words") === 7L)
    assert(r.getAs[Long]("n_sentences") === 3L)
    assert(r.getAs[Long]("wps_milli") === 2333L) // 7000/3
    // word chars: "Onetwothree.Fourfive!" 21 + "Sixseven." 9 = 30
    assert(r.getAs[Long]("cpw_milli") === 4285L) // 30000/7
  }

  test("langConfusion: per-true-language shares sum to ~1e6") {
    import spark.implicits._
    val d = Seq(
      (1L, "the cat and the dog", "en", "a"),   // en predicted
      (2L, "el perro y la casa", "en", "a"),    // es predicted, true en
      (3L, "xyzzy qwerty", "fr", "a"))          // unknown, true fr
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val got = TextAnalysis.langConfusion(d).collect()
      .map(r => (r.getAs[String]("lang_true"), r.getAs[String]("lang_pred"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("share_ppm")))
    assert(got.toSeq === Seq(
      ("en", "en", 1L, 500000L),
      ("en", "es", 1L, 500000L),
      ("fr", "unknown", 1L, 1000000L)))
  }

  test("freqSpectrum folds token counts onto log2 buckets per lang") {
    val d = docs(1L -> "a a a b b c")
    // a×3 (bucket 2), b×2 (bucket 2), c×1 (bucket 1)
    val got = TextAnalysis.freqSpectrum(d).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("bucket"),
        r.getAs[Long]("n_types"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("min_k"), r.getAs[Long]("max_k")))
    assert(got.toSeq === Seq(
      ("en", 1L, 1L, 1L, 1L, 1L),
      ("en", 2L, 2L, 5L, 2L, 3L)))
  }

  test("distinctiveNgrams ranks by exact-ppm lift; shared grams dilute") {
    val d = Seq(
      (1L, "x y z x y z x y z x y z", "en", "a"),
      (2L, "p q r p q r p q r x y z", "en", "b"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val got = TextAnalysis.distinctiveNgrams(d, k = 10, minSupport = 3)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("rank"),
        r.getAs[String]("gram"), r.getAs[Long]("n_src"),
        r.getAs[Long]("n_all"), r.getAs[Long]("lift_ppm")))
    // source a: "x y z" leaks into b (n_all 5) -> lift 1.6e6, below the
    // a-exclusive grams at exactly 2e6 (= total_all/total_src).
    assert(got.toSeq === Seq(
      ("a", 1L, "y z x", 3L, 3L, 2000000L),
      ("a", 2L, "z x y", 3L, 3L, 2000000L),
      ("a", 3L, "x y z", 4L, 5L, 1600000L),
      ("b", 1L, "p q r", 3L, 3L, 2000000L)))
  }

  test("piiRedact: emails and phones are gone, counts reconcile") {
    val cust = Seq((7L, "Customer#000000007", 3, 100.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val r = TextAnalysis.piiRedact(cust).collect()
    assert(r.length === 1)
    val red = r(0).getAs[String]("redacted")
    assert(r(0).getAs[Long]("n_emails") === 1L)
    assert(r(0).getAs[Long]("n_phones") === 1L)
    assert(red.contains("[EMAIL]") && red.contains("[PHONE]"))
    assert(!red.contains("@example.com"))
    assert(!red.matches(".*\\d{2}-\\d{3}-\\d{3}-\\d{4}.*"))
    // non-PII content survives redaction
    assert(red.contains("Customer#000000007") && red.contains("BUILDING"))
  }

  test("tfidf top-k: idf²-weighted bigram scores, rare phrases dominate, ties by id") {
    val d = docs(
      0L -> "alpha beta gamma delta", // bigrams: alpha-beta, beta-gamma, gamma-delta
      1L -> "alpha beta gamma zeta",  // shares TWO bigrams with doc 0
      2L -> "alpha beta eta theta",   // shares ONE (the most common one)
      3L -> "iota kappa lambda mu")   // shares nothing
    // df: "alpha beta"=3 → w=333333; "beta gamma"=2 → w=500000; rest df=1
    val got = TextAnalysis.tfidfTopK(d, k = 10, queryMod = 2).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank")) ->
        ((r.getAs[Long]("neighbor_id"), r.getAs[Long]("score")))).toMap
    // query 0: doc 1 = 333333² + 500000² beats doc 2 = 333333²
    assert(got((0L, 1L)) === ((1L, 333333L * 333333L + 500000L * 500000L)))
    assert(got((0L, 2L)) === ((2L, 333333L * 333333L)))
    // query 2: docs 0 and 1 tie on the shared "alpha beta" → id order
    assert(got((2L, 1L)) === ((0L, 333333L * 333333L)))
    assert(got((2L, 2L)) === ((1L, 333333L * 333333L)))
    // doc 3 never appears
    assert(got.values.forall(_._1 != 3L))
    assert(got.size === 4)
  }

  test("lang_signal_counts equals the regex battery on adversarial text") {
    import graft.engine.expr.NativeFunctions
    // boundary traps: stopwords embedded in longer \w runs (the5, _the,
    // thé → run "th"), digits/underscore as word chars, shared es/fr
    // words (la, de, que, un) counting into BOTH sets, mixed case, Han
    // chars adjacent to ASCII words, supplementary-plane Han (𠀀),
    // non-Han CJK (kana), empty string
    val texts = Seq(
      "The quick brown fox and the lazy dog",
      "la de que un PARA con y el",
      "le la pour AVEC dans de que un sur et",
      "the5 _the the_ thé the-the THE",
      "漢字テスト the 漢 and 𠀀𠀁 中文",
      "a b c 1_2 for-with on.of to,in is;a",
      "",
      "qué quelла 'la' (de) [un] {que}")
    val d = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val fused = d.select(col("doc_id"),
      NativeFunctions.langSignalCounts(col("text"),
        Seq(TextAnalysis.EnStopWords, TextAnalysis.EsStopWords,
          TextAnalysis.FrStopWords)).as("c"))
    val rx = d.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(TextAnalysis.EnStop), lit(0)))
        .cast("long").as("en"),
      size(regexp_extract_all(col("text"), lit(TextAnalysis.EsStop), lit(0)))
        .cast("long").as("es"),
      size(regexp_extract_all(col("text"), lit(TextAnalysis.FrStop), lit(0)))
        .cast("long").as("fr"),
      size(regexp_extract_all(col("text"), lit(TextAnalysis.HanChar), lit(0)))
        .cast("long").as("han"))
    val joined = fused.join(rx, "doc_id").orderBy("doc_id").collect()
    joined.foreach { r =>
      val c = r.getAs[scala.collection.Seq[Long]]("c")
      assert(c(0) === r.getAs[Long]("en"), s"en @ doc ${r.get(0)}")
      assert(c(1) === r.getAs[Long]("es"), s"es @ doc ${r.get(0)}")
      assert(c(2) === r.getAs[Long]("fr"), s"fr @ doc ${r.get(0)}")
      assert(c(3) === r.getAs[Long]("han"), s"han @ doc ${r.get(0)}")
    }
    // spot-check the traps landed where intended: doc 3's "the5"/"_the"/
    // "the_" are single \w runs (no boundary) and "thé" tokenizes as
    // "th" — only "the-the" (2) + "THE" count; doc 4's Han census is
    // 漢字 + 漢 + 𠀀𠀁 (supplementary-plane Ext B) + 中文 = 7, katakana
    // テスト excluded (script Katakana, not Han)
    val byId = joined.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[scala.collection.Seq[Long]]("c")).toMap
    assert(byId(3L) === Seq(3L, 0L, 0L, 0L))
    assert(byId(4L)(3) === 7L)
  }

  test("text_stat_counts equals the 5-pass regex battery on adversarial text") {
    import graft.engine.expr.NativeFunctions
    // traps: NBSP (punct + ws-token glue, not a \s split point), tabs/CR,
    // supplementary-plane code point (one punct + one BPE match),
    // letter/digit run alternation (a1b2), underscores (punct + BPE
    // single but \w for the stopword boundary), accents splitting
    // letter runs, leading/trailing whitespace, empty string
    val texts = Seq(
      "The quick brown fox and the lazy dog.",
      "a1b2 c3_d4 e5-f6",
      "x\u00A0y z\tw\r\nv a\u00A0b",
      "café résumé naïve",
      "𠀀 mixed 漢 text",
      "  leading and trailing  ",
      "",
      "the _the the_ the5 THE the-the")
    val d = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def cnt(p: String) =
      size(regexp_extract_all(col("text"), lit(p), lit(0))).cast("long")
    val fused = d.select(col("doc_id"),
      NativeFunctions.textStatCounts(col("text"),
        TextAnalysis.EnStopWords).as("c"))
    val rx = d.select(col("doc_id"),
      size(TextAnalysis.wsTokens(col("text"))).cast("long").as("ws"),
      cnt(TextAnalysis.BpeTokenPattern).as("bpe"),
      cnt("[^A-Za-z0-9\\s]").as("punct"),
      cnt("[A-Z]").as("upper"),
      cnt(TextAnalysis.EnStop).as("en"))
    fused.join(rx, "doc_id").orderBy("doc_id").collect().foreach { r =>
      val c = r.getAs[scala.collection.Seq[Long]]("c")
      assert(c(0) === r.getAs[Long]("ws"), s"ws @ doc ${r.get(0)}")
      assert(c(1) === r.getAs[Long]("bpe"), s"bpe @ doc ${r.get(0)}")
      assert(c(2) === r.getAs[Long]("punct"), s"punct @ doc ${r.get(0)}")
      assert(c(3) === r.getAs[Long]("upper"), s"upper @ doc ${r.get(0)}")
      assert(c(4) === r.getAs[Long]("en"), s"en @ doc ${r.get(0)}")
    }
  }

  test("ASCII word boundary is the pinned contract: a stopword abutting a " +
    "non-ASCII letter COUNTS (deliberate divergence from Java's Unicode \\b)") {
    import graft.engine.expr.NativeFunctions
    // The r14 parity docs ("quelла") never put a set word DIRECTLY
    // against a non-ASCII letter, so the boundary semantics were
    // accidental. This pins them: the fused scan tokenizes maximal
    // ASCII-[A-Za-z0-9_] runs (RE2/DuckDB-oracle \b), so "que" in
    // "queла" and "the" in "the中文" are complete tokens and COUNT —
    // whereas Java's default \b (Unicode-aware isLetterOrDigit) sees
    // que|ла as word-internal and does NOT match. The oracle gate
    // replays the ASCII reading; the Java reading is the one we
    // deliberately left behind.
    val d = Seq((0L, "queла de1а the中文"), (1L, "unд 2ла para"))
      .toDF("doc_id", "text")
    val fused = d.select(col("doc_id"),
      NativeFunctions.langSignalCounts(col("text"),
        Seq(TextAnalysis.EnStopWords, TextAnalysis.EsStopWords,
          TextAnalysis.FrStopWords)).as("c"),
      NativeFunctions.textStatCounts(col("text"),
        TextAnalysis.EnStopWords).as("s"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[scala.collection.Seq[Long]]("c"),
          r.getAs[scala.collection.Seq[Long]]("s"))).toMap
    // doc 0: runs = que, de1 (NOT de — the digit extends the run), the;
    // que ∈ es+fr, the ∈ en; han = 中文
    assert(fused(0L)._1 === Seq(1L, 1L, 1L, 2L))
    assert(fused(0L)._2(4) === 1L) // stopword_hits: the
    // doc 1: runs = un, 2 (ла breaks it), para; un ∈ es+fr, para ∈ es
    assert(fused(1L)._1 === Seq(0L, 2L, 1L, 0L))
    // and the Java-regex battery does NOT count the abutting forms —
    // the divergence is real, measured here, and intended
    val rx = d.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(TextAnalysis.EsStop), lit(0)))
        .cast("long").as("es")).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("es")).toMap
    assert(rx(0L) === 0L) // Java \b: queла is one word, de1а too
    assert(rx(1L) === 1L) // para survives (space-delimited); unд does not
  }

  test("identical fused-scan calls canonicalize equal (Seq word sets, " +
    "content equality — r14 ADVICE)") {
    import graft.engine.expr.NativeFunctions
    import org.apache.spark.sql.catalyst.expressions.Literal
    def sets() = IndexedSeq(TextAnalysis.EnStopWords.toIndexedSeq,
      TextAnalysis.EsStopWords.toIndexedSeq)
    val a = NativeFunctions.LangSignalCounts(Literal("x"), sets())
    val b = NativeFunctions.LangSignalCounts(Literal("x"), sets())
    val c = NativeFunctions.TextStatCounts(Literal("x"),
      TextAnalysis.EnStopWords.toIndexedSeq)
    val d2 = NativeFunctions.TextStatCounts(Literal("x"),
      TextAnalysis.EnStopWords.toIndexedSeq)
    assert(a == b && a.semanticEquals(b),
      "LangSignalCounts must compare by content for Catalyst CSE")
    assert(c == d2 && c.semanticEquals(d2),
      "TextStatCounts must compare by content for Catalyst CSE")
  }

  test("word_rep_counts: string-input kernel == split(lower)-fed array " +
    "kernel == the pre-r16 shuffle pipeline, on adversarial whitespace") {
    import graft.engine.expr.NativeFunctions
    val texts = Seq(
      "",                                     // no tokens
      "   \t\n  ",                            // ws only
      "One one ONE",                          // case folding, top=3
      "a b a b a b",                          // repeated 2/3-grams
      "tab\tsep\u000Bvt\fff\rcr end",         // every Java-\s class
      "nbsp\u00A0keeps one token",            // NBSP is NOT Java \s
      "café café 日本語 tokens", // multibyte
      "x",                                    // single token: n2=n3=0
      "lead and trail  ")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    NativeFunctions.ensureRegistered(spark)
    val both = df.select(col("doc_id"),
        NativeFunctions.wordRepCounts(col("text")).as("s"),
        NativeFunctions.wordRepCounts(
          split(lower(col("text")), "\\s+")).as("a"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2),
        s"doc ${r.getLong(0)}: string vs array kernel")
    }
    // spot-pin the counters against hand counts
    val m = both.map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(m(0L) === Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L))
    assert(m(2L) === Seq(3L, 1L, 3L, 2L, 1L, 1L, 1L)) // one/one/one
    assert(m(3L) === Seq(6L, 2L, 3L, 5L, 2L, 4L, 2L)) // a b a b a b
    assert(m(5L).head === 3L)  // NBSP glues "nbsp keeps"
    assert(m(7L) === Seq(1L, 1L, 1L, 0L, 0L, 0L, 0L))
  }
}
