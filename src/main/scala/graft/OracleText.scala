package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.ext._
import OraclePreludes._

/** Text-analysis queries — split from ExtQueries (registration + DuckDB oracle
  * side by side; ground rules in [[ExtQueries]]).
  */
object OracleText {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_surprisal_mix" -> ((s, dir) => TextAnalysis.surprisalMix(s, dir)),
    "text_lang_confusion" -> ((s, dir) => TextAnalysis.langConfusion(s, dir)),
    "text_readability" -> ((s, dir) => TextAnalysis.readability(s, dir)),
    "text_fertility" -> ((s, dir) => TextAnalysis.fertility(s, dir)),
    // ------------------------------------------------ text analysis
    "text_analyze" -> ((s, dir) =>
      TextAnalysis.analyze(s, dir).orderBy(col("doc_id"))),
    "text_langid" -> ((s, dir) =>
      TextAnalysis.langId(s, dir).orderBy(col("doc_id"))),
    "text_quality_rollup" -> ((s, dir) => TextAnalysis.qualityRollup(s, dir)),
    "text_winnow" -> ((s, dir) =>
      TextAnalysis.winnowFingerprint(s, dir).orderBy(col("doc_id"))),
    "text_keywords" -> ((s, dir) => TextAnalysis.keywords(s, dir)),
    "text_tfidf_topk" -> ((s, dir) => TextAnalysis.tfidfTopK(s, dir)),
    "rag_chunk_topk" -> ((s, dir) => TextAnalysis.ragChunkTopK(s, dir)),
    "rag_bm25_topk" -> ((s, dir) => TextAnalysis.bm25ChunkTopK(s, dir)),
    "text_bpe_merges" -> ((s, dir) => TextAnalysis.bpeMerges(s, dir)),
    "text_repetition" -> ((s, dir) =>
      TextAnalysis.repetition(s, dir).orderBy(col("doc_id"))),
    "text_surprisal" -> ((s, dir) =>
      TextAnalysis.surprisal(s, dir).orderBy(col("doc_id"))),
    "text_bigram_surprisal" -> ((s, dir) =>
      TextAnalysis.bigramSurprisal(s, dir)),
    "text_pii_redact" -> ((s, dir) =>
      TextAnalysis.piiRedact(s, dir).orderBy(col("c_custkey"))),
    // ------------------------------------------------ round-6 additions
    "text_vocab" -> ((s, dir) => TextAnalysis.vocab(s, dir)),
    "text_ngram_census" -> ((s, dir) => TextAnalysis.ngramCensus(s, dir)),
    "text_freq_spectrum" -> ((s, dir) => TextAnalysis.freqSpectrum(s, dir)),
    "text_distinctive_ngrams" ->
      ((s, dir) => TextAnalysis.distinctiveNgrams(s, dir)),
    "text_novelty" -> ((s, dir) => TextAnalysis.novelty(s, dir)),
    "text_gopher_rules" -> ((s, dir) => TextAnalysis.gopherRules(s, dir)),
  )

  def oracleSql: Map[String, String] = Map(
    "text_analyze" ->
      """SELECT doc_id, lang, source,
        |  length(text) AS n_chars_m,
        |  len(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS n_tokens_ws,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_tokens_bpe,
        |  len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
        |  len(regexp_extract_all(text, '[A-Z]')) AS n_upper,
        |  len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) * 1000000 // greatest(length(text), 1) AS punct_ppm,
        |  len(regexp_extract_all(text, '(?i)\b(the|and|of|to|in|is|a|for|with|on)\b'))
        |    * 1000000 // greatest(len(list_filter(string_split_regex(text, '\s+'),
        |                                          x -> x != '')), 1) AS stopword_ppm,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_langid" ->
      """SELECT doc_id, lang AS lang_true,
        |  len(regexp_extract_all(text, '(?i)\b(the|and|of|to|in|is|a|for|with|on)\b')) AS en_hits,
        |  len(regexp_extract_all(text, '(?i)\b(el|la|de|que|y|en|un|por|con|para)\b')) AS es_hits,
        |  len(regexp_extract_all(text, '(?i)\b(le|la|de|et|un|pour|que|dans|sur|avec)\b')) AS fr_hits,
        |  len(regexp_extract_all(text, '\p{Han}')) AS han_hits,
        |  CASE WHEN len(regexp_extract_all(text, '\p{Han}')) > 0 THEN 'zh'
        |    WHEN len(regexp_extract_all(text, '(?i)\b(the|and|of|to|in|is|a|for|with|on)\b')) >=
        |         len(regexp_extract_all(text, '(?i)\b(el|la|de|que|y|en|un|por|con|para)\b'))
        |     AND len(regexp_extract_all(text, '(?i)\b(the|and|of|to|in|is|a|for|with|on)\b')) >=
        |         len(regexp_extract_all(text, '(?i)\b(le|la|de|et|un|pour|que|dans|sur|avec)\b'))
        |     AND len(regexp_extract_all(text, '(?i)\b(the|and|of|to|in|is|a|for|with|on)\b')) > 0
        |    THEN 'en'
        |    WHEN len(regexp_extract_all(text, '(?i)\b(el|la|de|que|y|en|un|por|con|para)\b')) >=
        |         len(regexp_extract_all(text, '(?i)\b(le|la|de|et|un|pour|que|dans|sur|avec)\b'))
        |     AND len(regexp_extract_all(text, '(?i)\b(el|la|de|que|y|en|un|por|con|para)\b')) > 0
        |    THEN 'es'
        |    WHEN len(regexp_extract_all(text, '(?i)\b(le|la|de|et|un|pour|que|dans|sur|avec)\b')) > 0
        |    THEN 'fr'
        |    ELSE 'unknown' END AS lang_pred
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Confusion matrix over the langid oracle's prediction rule.
    "text_lang_confusion" ->
      """WITH p AS (
        |  SELECT lang AS lang_true,
        |    CASE WHEN len(regexp_extract_all(text, '\p{Han}')) > 0 THEN 'zh'
        |      WHEN len(regexp_extract_all(text, '(?i)\b(the|and|of|to|in|is|a|for|with|on)\b')) >=
        |           len(regexp_extract_all(text, '(?i)\b(el|la|de|que|y|en|un|por|con|para)\b'))
        |       AND len(regexp_extract_all(text, '(?i)\b(the|and|of|to|in|is|a|for|with|on)\b')) >=
        |           len(regexp_extract_all(text, '(?i)\b(le|la|de|et|un|pour|que|dans|sur|avec)\b'))
        |       AND len(regexp_extract_all(text, '(?i)\b(the|and|of|to|in|is|a|for|with|on)\b')) > 0
        |      THEN 'en'
        |      WHEN len(regexp_extract_all(text, '(?i)\b(el|la|de|que|y|en|un|por|con|para)\b')) >=
        |           len(regexp_extract_all(text, '(?i)\b(le|la|de|et|un|pour|que|dans|sur|avec)\b'))
        |       AND len(regexp_extract_all(text, '(?i)\b(el|la|de|que|y|en|un|por|con|para)\b')) > 0
        |      THEN 'es'
        |      WHEN len(regexp_extract_all(text, '(?i)\b(le|la|de|et|un|pour|que|dans|sur|avec)\b')) > 0
        |      THEN 'fr'
        |      ELSE 'unknown' END AS lang_pred
        |  FROM documents
        |), c AS (
        |  SELECT lang_true, lang_pred, count(*)::BIGINT AS n_docs
        |  FROM p GROUP BY 1, 2
        |)
        |SELECT lang_true, lang_pred, n_docs,
        |  CAST(n_docs * 1000000 //
        |    sum(n_docs) OVER (PARTITION BY lang_true) AS BIGINT) AS share_ppm
        |FROM c ORDER BY lang_true, lang_pred""".stripMargin,

    // Corpus-level ratio-of-sums readability components per source.
    "text_readability" ->
      """WITH a AS (
        |  SELECT source,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |                    x -> x != ''))::BIGINT AS n_words,
        |    len(regexp_extract_all(text, '[.!?]+'))::BIGINT AS n_sentences,
        |    length(regexp_replace(text, '\s', '', 'g'))::BIGINT
        |      AS n_word_chars
        |  FROM documents
        |)
        |SELECT source, count(*)::BIGINT AS n_docs,
        |  sum(n_words)::BIGINT AS n_words,
        |  sum(n_sentences)::BIGINT AS n_sentences,
        |  CAST(sum(n_words) * 1000 // greatest(sum(n_sentences), 1)
        |       AS BIGINT) AS wps_milli,
        |  CAST(sum(n_word_chars) * 1000 // greatest(sum(n_words), 1)
        |       AS BIGINT) AS cpw_milli
        |FROM a GROUP BY 1 ORDER BY source""".stripMargin,

    // Tokenizer fertility: BPE-ish subtokens per whitespace word and
    // chars per subtoken, ratio-of-sums per (lang, source).
    "text_fertility" ->
      """WITH a AS (
        |  SELECT lang, source,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |                    x -> x != ''))::BIGINT AS n_words,
        |    len(regexp_extract_all(text,
        |        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::BIGINT AS n_sub,
        |    length(text)::BIGINT AS n_chars
        |  FROM documents
        |)
        |SELECT lang, source, count(*)::BIGINT AS n_docs,
        |  sum(n_words)::BIGINT AS sum_words,
        |  sum(n_sub)::BIGINT AS sum_subtokens,
        |  CAST(sum(n_sub) * 1000 // greatest(sum(n_words), 1)
        |       AS BIGINT) AS fertility_milli,
        |  CAST(sum(n_chars) * 1000 // greatest(sum(n_sub), 1)
        |       AS BIGINT) AS chars_per_subtoken_milli
        |FROM a GROUP BY 1, 2 ORDER BY lang, source""".stripMargin,

    "text_quality_rollup" ->
      """WITH a AS (
        |  SELECT lang, source, length(text) AS n_chars,
        |    len(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS n_tok,
        |    len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
        |    len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) * 1000000 // greatest(length(text), 1) AS punct_ppm
        |  FROM documents
        |)
        |SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
        |  min(punct_ppm) AS min_punct_ppm, max(punct_ppm) AS max_punct_ppm,
        |  CAST(sum(n_punct) * 1000000 // greatest(sum(n_chars), 1) AS BIGINT) AS corpus_punct_ppm
        |FROM a GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    // Karp-Rabin polynomial over code points, exact integer replay of the
    // engine's rolling form (r15 rebuild): fold h = (h*257 + cp) mod 2^61-1
    // over each 16-cp window; HUGEINT keeps the multiply exact. The
    // prepended 0 is the fold's initial accumulator (and makes the empty
    // window hash 0, like the engine).
    "text_winnow" ->
      """WITH cp AS (
        |  SELECT doc_id,
        |    list_transform(regexp_extract_all(text, '.', 0, 's'),
        |                   x -> unicode(x)) AS cps
        |  FROM documents
        |), wh AS (
        |  SELECT doc_id,
        |    list_transform(range(0, greatest(len(cps) - 15, 1)),
        |      i -> list_reduce(list_prepend(0::BIGINT, cps[i+1:i+16]),
        |        (h, c) -> ((h::HUGEINT * 257 + c)
        |                   % 2305843009213693951)::BIGINT)) AS hs
        |  FROM cp
        |)
        |SELECT doc_id, list_min(hs) AS fingerprint_h,
        |  len(list_distinct(hs)) AS n_distinct_windows
        |FROM wh ORDER BY doc_id""".stripMargin,

    // Per-language trigram occurrence census, top-20 per language.
    // Frequency-of-frequencies per language, log2-bucketed k.
    "text_freq_spectrum" ->
      """WITH tok AS (
        |  SELECT lang, unnest(list_filter(
        |    string_split_regex(lower(text), '\s+'), x -> x != '')) AS token
        |  FROM documents
        |), c AS (
        |  SELECT lang, token, count(*)::BIGINT AS k FROM tok GROUP BY 1, 2
        |)
        |SELECT lang, length(bin(k))::BIGINT AS bucket,
        |  count(*)::BIGINT AS n_types, sum(k)::BIGINT AS n_tokens,
        |  min(k)::BIGINT AS min_k, max(k)::BIGINT AS max_k
        |FROM c GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin,

    // Per-source top-k 3-grams by exact-ppm lift over the corpus share.
    "text_distinctive_ngrams" ->
      """WITH tk AS (
        |  SELECT source, list_filter(string_split_regex(lower(text), '\s+'),
        |                             x -> x != '') AS t
        |  FROM documents
        |), g AS (
        |  SELECT source, t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS gram
        |  FROM (SELECT source, t, unnest(range(0, len(t) - 2)) AS i
        |        FROM tk WHERE len(t) >= 3)
        |), ps AS (
        |  SELECT source, gram, count(*)::BIGINT AS n_src FROM g GROUP BY 1, 2
        |), ts AS (
        |  SELECT source, sum(n_src)::BIGINT AS total_src FROM ps GROUP BY 1
        |), pa AS (
        |  SELECT gram, sum(n_src)::BIGINT AS n_all FROM ps GROUP BY 1
        |), ta AS (
        |  SELECT sum(n_src)::BIGINT AS total_all FROM ps
        |), l AS (
        |  SELECT ps.source, ps.gram, ps.n_src, pa.n_all,
        |    ps.n_src * ta.total_all * 1000000 // (pa.n_all * ts.total_src)
        |      AS lift_ppm
        |  FROM ps JOIN pa USING (gram) JOIN ts USING (source) CROSS JOIN ta
        |  WHERE ps.n_src >= 3
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY lift_ppm DESC, gram) AS rank
        |  FROM l
        |)
        |SELECT source, rank::BIGINT AS rank, gram, n_src, n_all,
        |  lift_ppm::BIGINT AS lift_ppm
        |FROM r WHERE rank <= 10 ORDER BY source, rank""".stripMargin,

    "text_ngram_census" ->
      """WITH tk AS (
        |  SELECT lang, list_filter(string_split_regex(lower(text), '\s+'),
        |                           x -> x != '') AS t
        |  FROM documents
        |), g AS (
        |  SELECT lang, t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS gram
        |  FROM (SELECT lang, t, unnest(range(0, len(t) - 2)) AS i
        |        FROM tk WHERE len(t) >= 3)
        |), c AS (
        |  SELECT lang, gram, count(*)::BIGINT AS n FROM g GROUP BY 1, 2
        |), r AS (
        |  SELECT lang, gram, n,
        |    row_number() OVER (PARTITION BY lang ORDER BY n DESC, gram) AS rk
        |  FROM c
        |)
        |SELECT lang, rk::BIGINT AS rank, gram, n FROM r WHERE rk <= 20
        |ORDER BY lang, rank""".stripMargin,

    "text_keywords" -> (toks +
      """, term AS (
        |  SELECT doc_id, unnest(t) AS term FROM toks
        |), tf AS (
        |  SELECT doc_id, term, count(*)::BIGINT AS tf
        |  FROM term GROUP BY doc_id, term
        |), df AS (
        |  SELECT term, count(DISTINCT doc_id)::BIGINT AS df
        |  FROM term GROUP BY term
        |)
        |SELECT doc_id, rk, term, tf, df, score FROM (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    (tf.tf * 1000000 // df.df)::BIGINT AS score,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |                       ORDER BY (tf.tf * 1000000 // df.df) DESC,
        |                                tf.term)::BIGINT AS rk
        |  FROM tf JOIN df ON tf.term = df.term)
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin),

    // Inverted-index sparse retrieval over word BIGRAMS (phrase
    // postings): idf²-weighted rare-term match score, integer-exact
    // (w = 1e6 // df, tf capped at 16 — the rational analogs of
    // log-idf and sublinear tf).
    // r16: postings keyed by the family 60-bit md5 prefix of the bigram
    // (terms never reach the output) — replayed here so both engines
    // group/join on the same value.
    "text_tfidf_topk" -> (toks +
      raw""", $docQmCte, tt AS (
        |  SELECT doc_id, ('0x' || substring(md5(t[p+1] || ' ' || t[p+2]),
        |                                    1, 15))::BIGINT AS term
        |  FROM (SELECT doc_id, t, unnest(range(0, len(t) - 1)) AS p
        |        FROM toks WHERE len(t) >= 2)
        |), tfq AS (
        |  SELECT doc_id, term, least(count(*), 16)::BIGINT AS tf
        |  FROM tt GROUP BY 1, 2
        |), rare AS (
        |  SELECT term, (1000000 // count(*))::BIGINT AS w
        |  FROM tfq GROUP BY term HAVING count(*) <= 100
        |), post AS (
        |  SELECT tfq.term, tfq.doc_id, tfq.tf * r.w AS wt
        |  FROM tfq JOIN rare r USING (term)
        |), sc AS (
        |  SELECT q.doc_id AS query_id, p.doc_id AS neighbor_id,
        |    sum(q.wt * p.wt)::BIGINT AS score
        |  FROM post q JOIN post p ON q.term = p.term
        |    AND q.doc_id % $docQmSql = 0 AND p.doc_id != q.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT query_id, rank, neighbor_id, score FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, neighbor_id)::BIGINT AS rank
        |  FROM sc) WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin),

    // RAG retrieval: tf-idf scoring of 32/24 sliding-window CHUNKS
    // (corpus_chunks' exact chunking, query docs held out of the index)
    // against whole-doc queries; chunk-grain df, provenance returned.
    "rag_chunk_topk" ->
      raw"""WITH $docQmCte, t0 AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
        |                             x -> x != '') AS t
        |  FROM documents WHERE doc_id % $docQmSql != 0
        |), n0 AS (
        |  SELECT doc_id, t, len(t)::BIGINT AS n FROM t0
        |), k AS (
        |  SELECT doc_id, t, n,
        |    unnest(range(0, greatest(1, (n - 32 + 23) // 24 + 1))) AS chunk_no
        |  FROM n0
        |), ct AS (
        |  SELECT doc_id, chunk_no,
        |    t[(chunk_no * 24 + 1)::INT : least(chunk_no * 24 + 32, n)::INT]
        |      AS ctoks
        |  FROM k
        |), ctt AS (
        |  SELECT doc_id, chunk_no,
        |    ('0x' || substring(md5(lower(ctoks[p+1]) || ' '
        |                           || lower(ctoks[p+2])), 1, 15))::BIGINT
        |      AS term
        |  FROM (SELECT doc_id, chunk_no, ctoks,
        |          unnest(range(0, len(ctoks) - 1)) AS p
        |        FROM ct WHERE len(ctoks) >= 2)
        |), ctf AS (
        |  SELECT doc_id, chunk_no, term, least(count(*), 16)::BIGINT AS tf
        |  FROM ctt GROUP BY 1, 2, 3
        |), rare AS (
        |  SELECT term, (1000000 // count(*))::BIGINT AS w
        |  FROM ctf GROUP BY term HAVING count(*) <= 100
        |), post AS (
        |  SELECT ctf.term, ctf.doc_id, ctf.chunk_no, ctf.tf * r.w AS wt
        |  FROM ctf JOIN rare r USING (term)
        |), qt AS (
        |  SELECT doc_id AS query_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |                x -> x != '') AS t
        |  FROM documents WHERE doc_id % $docQmSql = 0
        |), qtt AS (
        |  SELECT query_id, ('0x' || substring(md5(t[p+1] || ' ' || t[p+2]),
        |                                      1, 15))::BIGINT AS term
        |  FROM (SELECT query_id, t, unnest(range(0, len(t) - 1)) AS p
        |        FROM qt WHERE len(t) >= 2)
        |), qtf AS (
        |  SELECT query_id, term, least(count(*), 16)::BIGINT AS tf
        |  FROM qtt GROUP BY 1, 2
        |), qpost AS (
        |  SELECT q.term, q.query_id, q.tf * r.w AS qwt
        |  FROM qtf q JOIN rare r USING (term)
        |), sc AS (
        |  SELECT qp.query_id, p.doc_id, p.chunk_no,
        |    sum(qp.qwt * p.wt)::BIGINT AS score
        |  FROM post p JOIN qpost qp ON p.term = qp.term
        |  GROUP BY 1, 2, 3
        |)
        |SELECT query_id, rank, doc_id, chunk_no::BIGINT AS chunk_no,
        |  (chunk_no * 24 + 1)::BIGINT AS start_token, score
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY score DESC, doc_id, chunk_no)::BIGINT AS rank
        |      FROM sc)
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    // Okapi BM25 over the same chunk index: RSJ-odds idf in milli (capped
    // 1e6), tf-saturation + length-norm as the exact rational
    // 22·tf·A/(10·tf·A+3A+9·dl) with A = floor(avg chunk length).
    "rag_bm25_topk" ->
      raw"""WITH $docQmCte, t0 AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
        |                             x -> x != '') AS t
        |  FROM documents WHERE doc_id % $docQmSql != 0
        |), n0 AS (
        |  SELECT doc_id, t, len(t)::BIGINT AS n FROM t0
        |), k AS (
        |  SELECT doc_id, t, n,
        |    unnest(range(0, greatest(1, (n - 32 + 23) // 24 + 1))) AS chunk_no
        |  FROM n0
        |), ct AS (
        |  SELECT doc_id, chunk_no,
        |    least(32, n - chunk_no * 24)::BIGINT AS dl,
        |    t[(chunk_no * 24 + 1)::INT : least(chunk_no * 24 + 32, n)::INT]
        |      AS ctoks
        |  FROM k
        |), stats AS (
        |  SELECT count(*)::BIGINT AS n_chunks,
        |    (sum(dl) // count(*))::BIGINT AS avg_dl
        |  FROM ct
        |), ctt AS (
        |  SELECT doc_id, chunk_no, dl,
        |    ('0x' || substring(md5(lower(ctoks[p+1]) || ' '
        |                           || lower(ctoks[p+2])), 1, 15))::BIGINT
        |      AS term
        |  FROM (SELECT doc_id, chunk_no, dl, ctoks,
        |          unnest(range(0, len(ctoks) - 1)) AS p
        |        FROM ct WHERE len(ctoks) >= 2)
        |), ctf AS (
        |  SELECT doc_id, chunk_no, dl, term, least(count(*), 16)::BIGINT AS tf
        |  FROM ctt GROUP BY 1, 2, 3, 4
        |), rare AS (
        |  SELECT term, s.avg_dl,
        |    least((2 * (s.n_chunks - count(*)) + 1) * 1000 // (2 * count(*) + 1),
        |          1000000)::BIGINT AS idf_m
        |  FROM ctf, stats s GROUP BY term, s.n_chunks, s.avg_dl
        |  HAVING count(*) <= 100
        |), post AS (
        |  SELECT c.term, c.doc_id, c.chunk_no,
        |    r.idf_m * (22000 * c.tf * r.avg_dl
        |      // (10 * c.tf * r.avg_dl + 3 * r.avg_dl + 9 * c.dl)) AS wt
        |  FROM ctf c JOIN rare r USING (term)
        |), qt AS (
        |  SELECT doc_id AS query_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |                x -> x != '') AS t
        |  FROM documents WHERE doc_id % $docQmSql = 0
        |), qtt AS (
        |  SELECT query_id, ('0x' || substring(md5(t[p+1] || ' ' || t[p+2]),
        |                                      1, 15))::BIGINT AS term
        |  FROM (SELECT query_id, t, unnest(range(0, len(t) - 1)) AS p
        |        FROM qt WHERE len(t) >= 2)
        |), qtf AS (
        |  SELECT query_id, term, least(count(*), 16)::BIGINT AS qtf
        |  FROM qtt GROUP BY 1, 2
        |), sc AS (
        |  SELECT q.query_id, p.doc_id, p.chunk_no,
        |    sum(q.qtf * p.wt)::BIGINT AS score
        |  FROM post p JOIN qtf q ON p.term = q.term
        |  GROUP BY 1, 2, 3
        |)
        |SELECT query_id, rank, doc_id, chunk_no::BIGINT AS chunk_no,
        |  (chunk_no * 24 + 1)::BIGINT AS start_token, score
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY score DESC, doc_id, chunk_no)::BIGINT AS rank
        |      FROM sc)
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "text_bpe_merges" -> (toks +
      """, vocab AS (
        |  SELECT word, count(*)::BIGINT AS n_w FROM (
        |    SELECT unnest(t) AS word FROM toks)
        |  GROUP BY word
        |), pr AS (
        |  SELECT substr(word, i::INT, 2) AS pair, n_w
        |  FROM vocab, unnest(range(1, length(word))) AS u(i)
        |  WHERE length(word) >= 2
        |), agg AS (
        |  SELECT pair, sum(n_w)::BIGINT AS cnt FROM pr GROUP BY pair
        |)
        |SELECT row_number() OVER (ORDER BY cnt DESC, pair)::BIGINT AS rank,
        |  pair, cnt
        |FROM agg QUALIFY rank <= 20 ORDER BY rank""".stripMargin),

    "text_repetition" -> (toks +
      """, ws AS (
        |  SELECT doc_id, unnest(t) AS word FROM toks
        |), pw AS (
        |  SELECT doc_id, word, count(*)::BIGINT AS c FROM ws GROUP BY 1, 2
        |), wstat AS (
        |  SELECT doc_id, sum(c)::BIGINT AS n_words,
        |    count(*)::BIGINT AS n_distinct_words, max(c)::BIGINT AS top_word_cnt
        |  FROM pw GROUP BY 1
        |), g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(t) >= 2 THEN
        |      list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
        |    ELSE [] END AS b2,
        |    CASE WHEN len(t) >= 3 THEN
        |      list_transform(range(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |    ELSE [] END AS b3
        |  FROM toks
        |), gs AS (
        |  SELECT doc_id, len(b2)::BIGINT AS n2, len(list_distinct(b2))::BIGINT AS d2,
        |    len(b3)::BIGINT AS n3, len(list_distinct(b3))::BIGINT AS d3
        |  FROM g
        |)
        |SELECT gs.doc_id, w.n_words, w.n_distinct_words, w.top_word_cnt,
        |  ((w.n_words - w.n_distinct_words) * 1000000 // greatest(w.n_words, 1))::BIGINT
        |    AS dup_word_ppm,
        |  (w.top_word_cnt * 1000000 // greatest(w.n_words, 1))::BIGINT AS top_word_ppm,
        |  ((gs.n2 - gs.d2) * 1000000 // greatest(gs.n2, 1))::BIGINT AS dup_2gram_ppm,
        |  ((gs.n3 - gs.d3) * 1000000 // greatest(gs.n3, 1))::BIGINT AS dup_3gram_ppm,
        |  (w.top_word_cnt * 1000000 // greatest(w.n_words, 1) > 200000
        |   OR (gs.n2 - gs.d2) * 1000000 // greatest(gs.n2, 1) > 200000) AS repetitive
        |FROM gs JOIN wstat w USING (doc_id) ORDER BY doc_id""".stripMargin),

    "text_surprisal" -> (toks +
      """, ws AS (
        |  SELECT doc_id, unnest(t) AS word FROM toks
        |), c AS (
        |  SELECT word, count(*)::BIGINT AS cnt FROM ws GROUP BY 1
        |), w2 AS (
        |  SELECT ws.doc_id,
        |    (1000000 * (SELECT sum(cnt) FROM c) // c.cnt)::BIGINT AS wgt
        |  FROM ws JOIN c USING (word)
        |)
        |SELECT doc_id, count(*)::BIGINT AS n_words, sum(wgt)::BIGINT AS surprisal,
        |  (sum(wgt) // count(*))::BIGINT AS surprisal_per_word
        |FROM w2 GROUP BY 1 ORDER BY doc_id""".stripMargin),

    // Surprisal x source mix: per-doc pipeline + source join + rollup.
    "text_surprisal_mix" -> (toks +
      """, ws AS (
        |  SELECT doc_id, unnest(t) AS word FROM toks
        |), c AS (
        |  SELECT word, count(*)::BIGINT AS cnt FROM ws GROUP BY 1
        |), w2 AS (
        |  SELECT ws.doc_id,
        |    (1000000 * (SELECT sum(cnt) FROM c) // c.cnt)::BIGINT AS wgt
        |  FROM ws JOIN c USING (word)
        |), d AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_words,
        |    (sum(wgt) // count(*))::BIGINT AS spw
        |  FROM w2 GROUP BY 1
        |)
        |SELECT doc.source, length(bin(d.spw))::BIGINT AS bucket,
        |  count(*)::BIGINT AS n_docs, sum(d.n_words)::BIGINT AS n_words
        |FROM d JOIN documents doc USING (doc_id)
        |GROUP BY 1, 2 ORDER BY source, bucket""".stripMargin),

    // Conditional bigram surprisal: inverse conditional-probability
    // mass floor(1e6 · cnt(w1·) / cnt(w1 w2)) per bigram occurrence;
    // prefix totals as a window over the bigram vocab.
    "text_bigram_surprisal" -> (toks +
      """, bgr AS (
        |  SELECT doc_id, t[p+1] AS w1, t[p+1] || ' ' || t[p+2] AS bg
        |  FROM (SELECT doc_id, t, unnest(range(0, len(t) - 1)) AS p
        |        FROM toks WHERE len(t) >= 2)
        |), vb AS (
        |  SELECT bg, w1, count(*)::BIGINT AS c2 FROM bgr GROUP BY 1, 2
        |), vw AS (
        |  SELECT bg, c2,
        |    CAST(sum(c2) OVER (PARTITION BY w1) AS BIGINT) AS c1
        |  FROM vb
        |), wgt AS (
        |  SELECT b.doc_id, ((1000000 * c1) // c2)::BIGINT AS wgt
        |  FROM bgr b JOIN vw USING (bg)
        |)
        |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
        |  sum(wgt)::BIGINT AS surprisal,
        |  (sum(wgt) // count(*))::BIGINT AS surprisal_per_bigram
        |FROM wgt GROUP BY 1 ORDER BY doc_id""".stripMargin),

    "text_pii_redact" ->
      """WITH tk AS (
        |  SELECT c_custkey,
        |    'Customer ' || c_name || ' <' || lower(replace(c_name, '#', '.')) ||
        |    '@example.com> phone ' ||
        |    (c_nationkey + 10)::BIGINT || '-' ||
        |    (c_custkey * 7 % 900 + 100) || '-' ||
        |    (c_custkey * 13 % 900 + 100) || '-' ||
        |    (c_custkey * 31 % 9000 + 1000) ||
        |    ' segment ' || c_mktsegment AS ticket
        |  FROM customer)
        |SELECT c_custkey,
        |  len(regexp_extract_all(ticket,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
        |  len(regexp_extract_all(ticket,
        |    '\b[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}\b'))::BIGINT AS n_phones,
        |  regexp_replace(regexp_replace(ticket,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\b[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '[PHONE]', 'g') AS redacted
        |FROM tk ORDER BY c_custkey""".stripMargin,

    // ------------------------------------------------ round-6 additions
    "text_vocab" -> (toks +
      """, term AS (
        |  SELECT doc_id, unnest(t) AS term FROM toks
        |), agg AS (
        |  SELECT term, count(*)::BIGINT AS tf,
        |    count(DISTINCT doc_id)::BIGINT AS df
        |  FROM term GROUP BY term
        |)
        |SELECT * FROM (
        |  SELECT row_number() OVER (ORDER BY tf DESC, term)::BIGINT AS rank,
        |    term, tf, df
        |  FROM agg)
        |WHERE rank <= 100 ORDER BY rank""".stripMargin),

    // r16: distinct/df on the family 60-bit md5 prefix of the bigram
    // (same identity as the engine's fused kernel) — the shingle text
    // reaches no output on either side.
    "text_novelty" -> (toks +
      """, sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(t) >= 2 THEN
        |      list_distinct(list_transform(range(1, len(t)),
        |        i -> ('0x' || substring(md5(t[i] || ' ' || t[i+1]),
        |                                1, 15))::BIGINT))
        |    ELSE [] END AS sh
        |  FROM toks
        |), ex AS (
        |  SELECT doc_id, unnest(sh) AS shingle FROM sh
        |), dfc AS (
        |  SELECT doc_id, count(*) OVER (PARTITION BY shingle) AS df FROM ex
        |)
        |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
        |  sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_novel,
        |  (sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) * 1000000
        |    // count(*))::BIGINT AS novelty_ppm
        |FROM dfc GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    "text_gopher_rules" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(text, '\s+'), x -> x != '') AS toks,
        |    string_split(text, chr(10)) AS lines
        |  FROM documents
        |), m AS (
        |  SELECT doc_id,
        |    len(toks)::BIGINT AS n_tokens,
        |    coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::BIGINT
        |      AS tok_chars,
        |    len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))::BIGINT
        |      AS n_alpha,
        |    (length(text) - length(replace(text, '#', '')))::BIGINT AS n_hash,
        |    len(lines)::BIGINT AS n_lines,
        |    len(list_filter(lines,
        |        l -> regexp_matches(rtrim(l), '\.\.\.$')))::BIGINT
        |      AS n_ellipsis,
        |    (len(lines) - len(list_distinct(lines)))::BIGINT AS n_dup_lines,
        |    len(list_distinct(regexp_extract_all(lower(text),
        |      '\b(the|be|to|of|and|that|have|with)\b', 1)))::BIGINT
        |      AS n_stopwords
        |  FROM d
        |)
        |SELECT doc_id, n_tokens, tok_chars, n_alpha, n_stopwords,
        |  (CASE WHEN n_tokens BETWEEN 50 AND 100000 THEN 1 ELSE 0 END)::BIGINT
        |    AS r_word_count,
        |  (CASE WHEN tok_chars >= n_tokens * 3 AND tok_chars <= n_tokens * 10
        |        THEN 1 ELSE 0 END)::BIGINT AS r_mean_word,
        |  (CASE WHEN n_hash * 10 <= n_tokens THEN 1 ELSE 0 END)::BIGINT
        |    AS r_hash_ratio,
        |  (CASE WHEN n_ellipsis * 10 <= n_lines * 3 THEN 1 ELSE 0 END)::BIGINT
        |    AS r_ellipsis,
        |  (CASE WHEN n_alpha * 5 >= n_tokens * 4 THEN 1 ELSE 0 END)::BIGINT
        |    AS r_alpha,
        |  (CASE WHEN n_dup_lines * 10 <= n_lines * 3 THEN 1 ELSE 0 END)::BIGINT
        |    AS r_dup_lines,
        |  (CASE WHEN n_stopwords >= 2 THEN 1 ELSE 0 END)::BIGINT AS r_stopwords,
        |  (r_word_count * r_mean_word * r_hash_ratio * r_ellipsis * r_alpha
        |    * r_dup_lines * r_stopwords)::BIGINT AS pass
        |FROM m ORDER BY doc_id""".stripMargin,

  )
}
