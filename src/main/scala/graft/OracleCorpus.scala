package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.ext._
import OraclePreludes._

/** Corpus-selection/packing queries — split from ExtQueries (registration + DuckDB oracle
  * side by side; ground rules in [[ExtQueries]]).
  */
object OracleCorpus {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_manifest" -> ((s, dir) => Corpus.manifest(s, dir)),
    "corpus_pack_stats" -> ((s, dir) => Corpus.packStats(s, dir)),
    "corpus_shards" -> ((s, dir) => Corpus.shardBalance(s, dir)),
    "corpus_batch_drift" -> ((s, dir) => Corpus.batchDrift(s, dir)),
    // ------------------------------------------------ corpus assembly
    "corpus_split" -> ((s, dir) => Corpus.splitAssign(s, dir)),
    "corpus_pack" -> ((s, dir) => Corpus.packSequences(s, dir)),
    "corpus_sample" -> ((s, dir) => Corpus.stratifiedSample(s, dir)),
    "corpus_mix" -> ((s, dir) => Corpus.weightedInterleave(s, dir)),
    "corpus_clean" -> ((s, dir) => Corpus.qualityClean(s, dir)),
    "corpus_contamination" -> ((s, dir) => Corpus.contamination(s, dir)),
    "corpus_decontaminated" -> ((s, dir) => Corpus.decontaminated(s, dir)),
    "corpus_length_stats" -> ((s, dir) => Corpus.lengthStats(s, dir)),
    "corpus_length_deciles" -> ((s, dir) => Corpus.lengthDeciles(s, dir)),
    "corpus_dsir_score" -> ((s, dir) => Corpus.dsirScore(s, dir)),
    "corpus_tv_drift" -> ((s, dir) => Corpus.tvDrift(s, dir)),
    "corpus_chunks" -> ((s, dir) =>
      Corpus.chunks(s, dir).orderBy(col("doc_id"), col("chunk_no"))),
    "corpus_temperature" -> ((s, dir) => Corpus.temperatureWeights(s, dir)),
    "corpus_epochs_plan" -> ((s, dir) => Corpus.epochsPlan(s, dir)),
    "corpus_dedup_weights" -> ((s, dir) => Corpus.dedupWeights(s, dir)),
    "corpus_dup_quality" -> ((s, dir) => Corpus.dupQuality(s, dir)),
    "corpus_quota_sample" -> ((s, dir) => Corpus.quotaSample(s, dir)),
    "corpus_pipeline" -> ((s, dir) => Corpus.pipeline(s, dir)),
    "corpus_epoch_order" -> ((s, dir) => Corpus.epochOrder(s, dir)),
    "corpus_hash_sample" -> ((s, dir) => Corpus.hashSample(s, dir)),
    "corpus_snapshot_diff" -> ((s, dir) => Corpus.snapshotDiff(s, dir)),
  )

  def oracleSql: Map[String, String] = Map(
    // Ingestion-order quality drift per (source, 25-doc batch).
    "corpus_batch_drift" -> ("WITH " + docQuality +
      """, q AS (
        |  SELECT doc_id, source, n_tokens, keep,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM dq
        |), k AS (
        |  SELECT source, (rn - 1) // 25 AS batch_no, n_tokens, keep
        |  FROM q
        |)
        |SELECT source, batch_no::BIGINT AS batch_no,
        |  count(*)::BIGINT AS n_docs,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) * 1000000
        |       // count(*) AS BIGINT) AS keep_ppm,
        |  CAST(sum(n_tokens) // count(*) AS BIGINT) AS mean_tokens
        |FROM k GROUP BY 1, 2 ORDER BY source, batch_no""".stripMargin),

    // Per-source pack-boundary straddles + tail fill, 2048-token budget.
    "corpus_pack_stats" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |                    x -> x != ''))::BIGINT AS n_tokens
        |  FROM documents
        |), s AS (
        |  SELECT source, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens AS start
        |  FROM t
        |), g AS (
        |  SELECT source, count(*)::BIGINT AS n_docs,
        |    sum(n_tokens)::BIGINT AS total_tokens,
        |    CAST(sum(CASE WHEN n_tokens > 0 AND
        |        start // 2048 != (start + n_tokens - 1) // 2048
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs
        |  FROM s GROUP BY 1
        |)
        |SELECT source, n_docs, total_tokens,
        |  (total_tokens + 2047) // 2048 AS n_packs, n_split_docs,
        |  n_split_docs * 1000000 // n_docs AS split_ppm,
        |  CASE WHEN total_tokens % 2048 = 0 THEN 1000000
        |       ELSE (total_tokens % 2048) * 1000000 // 2048
        |  END AS tail_fill_ppm
        |FROM g ORDER BY source""".stripMargin,

    // Content-hash shard balance, exact ppm shares over 32 shards.
    "corpus_shards" ->
      """WITH a AS (
        |  SELECT try_cast('0x' || substring(sha256(text), 1, 8) AS BIGINT)
        |      % 32 AS shard,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |                    x -> x != ''))::BIGINT AS n_tokens,
        |    n_chars
        |  FROM documents
        |), g AS (
        |  SELECT shard, count(*)::BIGINT AS n_docs,
        |    sum(n_tokens)::BIGINT AS n_tokens,
        |    CAST(sum(n_chars) AS BIGINT) AS n_chars
        |  FROM a GROUP BY 1
        |)
        |SELECT shard, n_docs, n_tokens, n_chars,
        |  CAST(n_docs * 1000000 // sum(n_docs) OVER () AS BIGINT)
        |    AS share_ppm
        |FROM g ORDER BY shard""".stripMargin,

    "corpus_split" ->
      """SELECT doc_id, lang, source, bucket,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id, lang, source,
        |        (('0x' || substr(sha256(text), 1, 8))::UBIGINT % 100)::BIGINT AS bucket
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "corpus_pack" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    len(list_filter(string_split_regex(text, '\s+'), x -> x != ''))::BIGINT
        |      AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) - n_tokens
        |      AS strt
        |  FROM t)
        |SELECT doc_id, source, n_tokens,
        |  (strt // 2048)::BIGINT AS pack_id, (strt % 2048)::BIGINT AS pack_offset
        |FROM c ORDER BY doc_id""".stripMargin,

    "corpus_sample" ->
      """SELECT doc_id, lang, rk FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |                       ORDER BY sha256(text), doc_id)::BIGINT AS rk
        |  FROM documents)
        |WHERE rk <= 20 ORDER BY lang, rk""".stripMargin,

    "corpus_mix" ->
      """SELECT doc_id, lang,
        |  ((2 * r - 1) * (4 // w))::BIGINT AS interleave_key
        |FROM (SELECT doc_id, lang,
        |        CASE WHEN lang = 'en' THEN 4
        |             WHEN lang = 'zh' THEN 1 ELSE 2 END AS w,
        |        row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS r
        |      FROM documents)
        |ORDER BY interleave_key, lang, doc_id""".stripMargin,

    "corpus_clean" -> ("WITH " + docQuality +
      """
        |SELECT doc_id, lang, source, n_tokens, punct_ppm,
        |  (reason IS NULL) AS keep, coalesce(reason, '') AS reason
        |FROM (SELECT doc_id, lang, source, n_tokens, punct_ppm,
        |        CASE WHEN n_tokens < 5 THEN 'too_short'
        |             WHEN punct_ppm > 300000 THEN 'too_much_punct'
        |             WHEN NOT terminal THEN 'no_terminal_punct' END AS reason
        |      FROM dq)
        |ORDER BY doc_id""".stripMargin),

    // r16: replays the engine's T0-stage identity — 60-bit md5 shingle
    // hashes as the blocking key and the DERIVED df cap (shingleCapCte)
    // instead of the pinned 100 — so the contamination family and the
    // dedup pair family share one candidate-generation definition on
    // both sides of the oracle gate.
    "corpus_contamination" -> (shingles3 + ", " +
      OraclePreludes.shingleCapCte +
      """, shx AS (
        |  SELECT doc_id, unnest(sh) AS shingle FROM sh
        |), exh AS (
        |  SELECT DISTINCT doc_id,
        |    ('0x' || substring(md5(shingle), 1, 15))::BIGINT AS sh_h
        |  FROM shx
        |), rare AS (
        |  SELECT doc_id, sh_h FROM (
        |    SELECT doc_id, sh_h, count(*) OVER (PARTITION BY sh_h) AS df
        |    FROM exh) WHERE df <= (SELECT cap FROM sdc)
        |), shared AS (
        |  SELECT b.doc_id AS bench_doc, t.doc_id AS train_doc,
        |    count(*)::BIGINT AS n_shared
        |  FROM rare b JOIN rare t ON b.sh_h = t.sh_h
        |  WHERE b.doc_id % 17 = 0 AND t.doc_id % 17 != 0
        |  GROUP BY 1, 2
        |), bn AS (
        |  SELECT doc_id AS bench_doc, count(*)::BIGINT AS bench_n
        |  FROM exh WHERE doc_id % 17 = 0 GROUP BY 1
        |)
        |SELECT s.bench_doc, s.train_doc, s.n_shared,
        |  (s.n_shared * 1000000 // b.bench_n)::BIGINT AS contam_ppm
        |FROM shared s JOIN bn b USING (bench_doc)
        |WHERE s.n_shared >= 2
        |ORDER BY bench_doc, train_doc""".stripMargin),

    "corpus_decontaminated" -> (shingles3 + ", " +
      OraclePreludes.shingleCapCte +
      """, shx AS (
        |  SELECT doc_id, unnest(sh) AS shingle FROM sh
        |), exh AS (
        |  SELECT DISTINCT doc_id,
        |    ('0x' || substring(md5(shingle), 1, 15))::BIGINT AS sh_h
        |  FROM shx
        |), rare AS (
        |  SELECT doc_id, sh_h FROM (
        |    SELECT doc_id, sh_h, count(*) OVER (PARTITION BY sh_h) AS df
        |    FROM exh) WHERE df <= (SELECT cap FROM sdc)
        |), flagged AS (
        |  SELECT DISTINCT t.doc_id
        |  FROM rare b JOIN rare t ON b.sh_h = t.sh_h
        |  WHERE b.doc_id % 17 = 0 AND t.doc_id % 17 != 0
        |  GROUP BY b.doc_id, t.doc_id HAVING count(*) >= 2
        |)
        |SELECT d.doc_id, d.lang, d.source
        |FROM documents d
        |WHERE d.doc_id % 17 != 0
        |  AND d.doc_id NOT IN (SELECT doc_id FROM flagged)
        |ORDER BY d.doc_id""".stripMargin),

    // Cluster-size-aware sampling weights: every duplicate cluster
    // contributes ONE document's worth of mass, split across members
    // (weight_ppm = 1e6 // size); per-language effective token mass.
    "corpus_dedup_weights" -> ("WITH RECURSIVE " +
      simhashDerivedPairs.stripPrefix("WITH ") + simhashDerivedCcChain +
      """, sz AS (
        |  SELECT doc_id, cluster_id,
        |    count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |  FROM cl
        |), dt AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |                    x -> x != ''))::BIGINT AS n_tokens
        |  FROM documents
        |)
        |SELECT lang, count(*)::BIGINT AS n_docs,
        |  CAST(sum(CASE WHEN cluster_size > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS raw_tokens,
        |  CAST(sum(n_tokens * (1000000 // cluster_size)) AS BIGINT)
        |    AS eff_tokens_micro,
        |  CAST(sum(n_tokens * (1000000 // cluster_size)) // sum(n_tokens)
        |       AS BIGINT) AS eff_ppm
        |FROM dt JOIN sz USING (doc_id)
        |GROUP BY lang ORDER BY lang""".stripMargin),

    // Duplication × quality audit: the dedup_clusters chain + the
    // corpus_clean gate, rolled up per (lang, duplicated?) cell.
    "corpus_dup_quality" -> ("WITH RECURSIVE " +
      simhashDerivedPairs.stripPrefix("WITH ") + simhashDerivedCcChain +
      """, sz AS (
        |  SELECT doc_id,
        |    (count(*) OVER (PARTITION BY cluster_id)) > 1 AS is_dup
        |  FROM cl
        |), """.stripMargin + docQuality + """, qk AS (
        |  SELECT doc_id, lang, n_tokens, keep FROM dq
        |)
        |SELECT lang, is_dup, count(*)::BIGINT AS n_docs,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) * 1000000
        |       // count(*) AS BIGINT) AS keep_ppm,
        |  CAST(sum(n_tokens) // count(*) AS BIGINT) AS mean_tokens
        |FROM qk JOIN sz USING (doc_id)
        |GROUP BY 1, 2 ORDER BY lang, is_dup""".stripMargin),

    // DSIR-shaped selection score: hashed-unigram (md5 mod 256) bucket
    // shares of the corpus_clean keep set vs all docs, per-doc
    // token-weighted mean share ratio in ppm (two-stage floor).
    "corpus_dsir_score" -> ("WITH " + docQuality +
      """, tb AS (
        |  SELECT doc_id, keep,
        |    ('0x' || substring(md5(tok), 1, 8))::BIGINT % 256 AS bucket
        |  FROM (SELECT doc_id, keep,
        |          unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |                             x -> x != '')) AS tok
        |        FROM dq)
        |), census AS (
        |  SELECT bucket, count(*)::BIGINT AS c_raw,
        |    sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS c_tgt
        |  FROM tb GROUP BY bucket
        |), tot AS (
        |  SELECT sum(c_raw)::BIGINT AS t_raw, sum(c_tgt)::BIGINT AS t_tgt
        |  FROM census
        |), wts AS (
        |  SELECT bucket,
        |    (((c_tgt + 1) * 1000000 // (t_tgt + 256)) * 1000000
        |      // greatest((c_raw + 1) * 1000000 // (t_raw + 256), 1))::BIGINT
        |      AS r_ppm
        |  FROM census, tot
        |)
        |SELECT tb.doc_id, count(*)::BIGINT AS n_tokens,
        |  (sum(w.r_ppm) // count(*))::BIGINT AS dsir_ppm,
        |  (sum(w.r_ppm) // count(*)) > 1000000 AS upweight
        |FROM tb JOIN wts w USING (bucket)
        |GROUP BY tb.doc_id ORDER BY tb.doc_id""".stripMargin),

    // Per-source unigram total-variation distance from the corpus, exact
    // ppm; the absent-word tail folds into (N - cov_s)·N_s, HUGEINT math.
    "corpus_tv_drift" ->
      """WITH tok AS (
        |  SELECT source,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |                       x -> x != '')) AS word
        |  FROM documents
        |), sw AS (
        |  SELECT source, word, count(*)::BIGINT AS c_sw FROM tok GROUP BY 1, 2
        |), wc AS (
        |  SELECT word, sum(c_sw)::BIGINT AS c_w FROM sw GROUP BY 1
        |), st AS (
        |  SELECT source, sum(c_sw)::BIGINT AS n_s, count(*)::BIGINT AS n_w
        |  FROM sw GROUP BY 1
        |), nt AS (
        |  SELECT sum(c_sw)::BIGINT AS n FROM sw
        |), j AS (
        |  SELECT s.source,
        |    sum(abs(s.c_sw::HUGEINT * nt.n - w.c_w::HUGEINT * t.n_s)) AS sum_d,
        |    sum(w.c_w::HUGEINT) AS cov
        |  FROM sw s JOIN wc w USING (word) JOIN st t USING (source), nt
        |  GROUP BY 1
        |)
        |SELECT t.source, t.n_s AS n_tokens, t.n_w AS n_distinct_words,
        |  (((j.sum_d + (nt.n::HUGEINT - j.cov) * t.n_s) * 1000000)
        |    // (2 * t.n_s::HUGEINT * nt.n))::BIGINT AS tv_ppm
        |FROM j JOIN st t USING (source), nt
        |ORDER BY t.source""".stripMargin,

    // chunking keeps original case: tokens split on the RAW text
    "corpus_chunks" ->
      """WITH t0 AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
        |                             x -> x != '') AS t
        |  FROM documents
        |), n0 AS (
        |  SELECT doc_id, t, len(t)::BIGINT AS n FROM t0
        |), k AS (
        |  SELECT doc_id, t, n,
        |    unnest(range(0, greatest(1, (n - 32 + 23) // 24 + 1))) AS chunk_no
        |  FROM n0
        |)
        |SELECT doc_id, chunk_no::BIGINT AS chunk_no,
        |  (chunk_no * 24 + 1)::BIGINT AS start_token,
        |  least(32, n - chunk_no * 24)::BIGINT AS n_chunk_tokens,
        |  array_to_string(t[(chunk_no * 24 + 1)::INT :
        |                    least(chunk_no * 24 + 32, n)::INT], ' ') AS chunk_text
        |FROM k ORDER BY doc_id, chunk_no""".stripMargin,


    // Token-budget mixing plan: per-lang epochs + upsampling at fixed
    // interleave weights (en 4 / zh 1 / other 2), budget 1M tokens.
    "corpus_epochs_plan" ->
      """WITH pl AS (
        |  SELECT lang,
        |    CASE WHEN lang = 'en' THEN 4 WHEN lang = 'zh' THEN 1
        |         ELSE 2 END AS w,
        |    count(*)::BIGINT AS n_docs,
        |    sum(len(list_filter(string_split_regex(lower(text), '\s+'),
        |                        x -> x != '')))::BIGINT AS avail
        |  FROM documents GROUP BY 1, 2
        |), tw AS (SELECT sum(w) AS tw FROM pl)
        |SELECT lang, n_docs, avail,
        |  (1000000 * w // tw)::BIGINT AS requested,
        |  ((1000000 * w // tw) // greatest(avail, 1))::BIGINT AS epochs,
        |  ((1000000 * w // tw) % greatest(avail, 1))::BIGINT
        |    AS partial_tokens,
        |  ((1000000 * w // tw) * 1000 // greatest(avail, 1))::BIGINT
        |    AS upsample_milli
        |FROM pl, tw ORDER BY lang""".stripMargin,

    "corpus_temperature" ->
      """WITH pl AS (
        |  SELECT lang, count(*)::BIGINT AS n_docs,
        |    sum(len(list_filter(string_split_regex(text, '\s+'),
        |                        x -> x != '')))::BIGINT AS n_tokens
        |  FROM documents GROUP BY lang
        |), t AS (
        |  SELECT *, sum(n_tokens) OVER () AS tot,
        |    floor(sqrt(n_tokens::DOUBLE))::BIGINT AS sq
        |  FROM pl
        |), t2 AS (
        |  SELECT *, sum(sq) OVER () AS sqtot FROM t
        |)
        |SELECT lang, n_docs, n_tokens,
        |  round(n_tokens * 1000000.0 / tot, 2) AS raw_ppm,
        |  round(sq * 1000000.0 / sqtot, 2) AS temp_ppm,
        |  round((sq::DOUBLE / sqtot) / (n_tokens::DOUBLE / tot), 4) AS upsample
        |FROM t2 ORDER BY lang""".stripMargin,

    // Per-source manifest: counts, masses, id span and an
    // order-insensitive 60-bit XOR content signature.
    "corpus_manifest" ->
      """SELECT source,
        |  count(*)::BIGINT AS n_docs,
        |  CAST(sum(len(list_filter(string_split_regex(text, '\s+'),
        |                           x -> x != ''))) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |  min(doc_id) AS min_doc_id,
        |  max(doc_id) AS max_doc_id,
        |  bit_xor(try_cast('0x' || substring(sha256(text), 1, 15)
        |                   AS BIGINT)) AS content_sig
        |FROM documents
        |GROUP BY source ORDER BY source""".stripMargin,

    "corpus_epoch_order" ->
      """SELECT doc_id, epoch,
        |  ('0x' || substring(md5(epoch || ':' || doc_id), 1, 15))::BIGINT
        |    AS order_key
        |FROM documents, range(0, 3) t(epoch)
        |ORDER BY epoch, order_key, doc_id""".stripMargin,

    // Per-source length profile, exact ceil(p·n) rank percentiles —
    // min/max ride the same rank window as ranks 1 and n.
    "corpus_length_stats" ->
      """WITH r AS (
        |  SELECT source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY n_chars, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM documents
        |)
        |SELECT source, n::BIGINT AS n_docs,
        |  min(CASE WHEN rn = 1 THEN n_chars END)::BIGINT AS min_chars,
        |  min(CASE WHEN rn = (n + 1) // 2 THEN n_chars END)::BIGINT
        |    AS median_chars,
        |  min(CASE WHEN rn = (n * 9 + 9) // 10 THEN n_chars END)::BIGINT
        |    AS p90_chars,
        |  min(CASE WHEN rn = n THEN n_chars END)::BIGINT AS max_chars
        |FROM r
        |WHERE rn = 1 OR rn = n OR rn = (n + 1) // 2
        |   OR rn = (n * 9 + 9) // 10
        |GROUP BY source, n ORDER BY source""".stripMargin,

    // Per-source NTILE(10) length census — the decile cut is
    // deterministic (ORDER BY n_chars, doc_id), so ntile transfers
    // verbatim.
    "corpus_length_deciles" ->
      """WITH d AS (
        |  SELECT source, n_chars,
        |    ntile(10) OVER (PARTITION BY source
        |                    ORDER BY n_chars, doc_id) AS decile
        |  FROM documents
        |)
        |SELECT source, decile::BIGINT AS decile, count(*)::BIGINT AS n_docs,
        |  min(n_chars)::BIGINT AS min_chars,
        |  max(n_chars)::BIGINT AS max_chars,
        |  sum(n_chars)::BIGINT AS sum_chars
        |FROM d GROUP BY 1, 2 ORDER BY source, decile""".stripMargin,

    "corpus_quota_sample" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |                    x -> x != ''))::BIGINT AS n_tokens,
        |    sha256(text) AS h
        |  FROM documents
        |), c AS (
        |  SELECT lang, sum(n_tokens) AS cell_tokens FROM d GROUP BY lang
        |), q AS (
        |  SELECT lang,
        |    ((20000 * cell_tokens) // sum(cell_tokens) OVER ())::BIGINT AS quota
        |  FROM c
        |), cum AS (
        |  SELECT d.doc_id, d.lang, d.n_tokens, q.quota,
        |    sum(n_tokens) OVER (PARTITION BY d.lang ORDER BY h, doc_id
        |                        ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens
        |  FROM d JOIN q ON d.lang = q.lang
        |)
        |SELECT doc_id, lang, n_tokens, cum_tokens, quota FROM cum
        |WHERE cum_tokens <= quota ORDER BY doc_id""".stripMargin,

    "corpus_pipeline" -> (shingles3 + ", " +
      OraclePreludes.shingleCapCte +
      """, shx AS (
        |  SELECT doc_id, unnest(sh) AS shingle FROM sh
        |), exh AS (
        |  SELECT DISTINCT doc_id,
        |    ('0x' || substring(md5(shingle), 1, 15))::BIGINT AS sh_h
        |  FROM shx
        |), rare AS (
        |  SELECT doc_id, sh_h FROM (
        |    SELECT doc_id, sh_h, count(*) OVER (PARTITION BY sh_h) AS df
        |    FROM exh) WHERE df <= (SELECT cap FROM sdc)
        |), flagged AS (
        |  SELECT DISTINCT t.doc_id
        |  FROM rare b JOIN rare t ON b.sh_h = t.sh_h
        |  WHERE b.doc_id % 17 = 0 AND t.doc_id % 17 != 0
        |  GROUP BY b.doc_id, t.doc_id HAVING count(*) >= 2
        |), """.stripMargin + docQuality + """, qr AS (
        |  SELECT *,
        |    CASE WHEN n_tokens < 5 THEN 'too_short'
        |         WHEN punct_ppm > 300000 THEN 'too_much_punct'
        |         WHEN NOT terminal THEN 'no_terminal_punct' END AS qreason,
        |    doc_id % 17 = 0 AS is_bench,
        |    (('0x' || substr(sha256(text), 1, 8))::UBIGINT % 100)::BIGINT AS bucket
        |  FROM dq
        |), canon AS (
        |  SELECT *,
        |    min(CASE WHEN qreason IS NULL AND NOT is_bench THEN doc_id END)
        |      OVER (PARTITION BY text) AS canonical,
        |    doc_id IN (SELECT doc_id FROM flagged) AS contaminated
        |  FROM qr
        |)
        |SELECT doc_id, lang, source,
        |  CASE WHEN is_bench THEN 'holdout'
        |       WHEN qreason IS NOT NULL THEN 'dropped'
        |       WHEN doc_id != canonical THEN 'dropped'
        |       WHEN contaminated THEN 'dropped'
        |       ELSE 'kept' END AS status,
        |  CASE WHEN is_bench THEN ''
        |       WHEN qreason IS NOT NULL THEN qreason
        |       WHEN doc_id != canonical THEN 'duplicate'
        |       WHEN contaminated THEN 'contaminated'
        |       ELSE '' END AS reason,
        |  CASE WHEN is_bench OR qreason IS NOT NULL
        |         OR doc_id != canonical OR contaminated THEN ''
        |       WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM canon ORDER BY doc_id""".stripMargin),

    "corpus_hash_sample" ->
      """WITH counts AS (
        |  SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1
        |), tot AS (
        |  SELECT sum(n_docs)::BIGINT AS total, count(*)::BIGINT AS n_sources
        |  FROM counts
        |), rates AS (
        |  SELECT source, n_docs,
        |    least(1000000,
        |      ((total + n_sources - 1) // n_sources) * 1000000 // n_docs
        |    )::BIGINT AS rate_ppm
        |  FROM counts, tot
        |), kept AS (
        |  SELECT d.source, count(*)::BIGINT AS n_kept
        |  FROM documents d JOIN rates r ON d.source = r.source
        |  WHERE ('0x' || substring(md5(d.source || ':' || d.doc_id), 1, 15))
        |          ::BIGINT % 1000000 < r.rate_ppm
        |  GROUP BY 1
        |)
        |SELECT r.source, r.n_docs, r.rate_ppm, k.n_kept
        |FROM rates r JOIN kept k ON r.source = k.source
        |ORDER BY r.source""".stripMargin,

    // Snapshot diff: the deterministic "previous" version (absent %11==3
    // rows, upper-cased %13==0 revisions, negated-id ghosts for deleted
    // %17==5 rows) is reconstructed identically, then hashes compare.
    "corpus_snapshot_diff" ->
      """WITH cur AS (
        |  SELECT doc_id, source, sha256(text) AS new_hash FROM documents
        |), prev AS (
        |  SELECT doc_id, source AS old_source,
        |    sha256(CASE WHEN doc_id % 13 = 0 THEN upper(text) ELSE text END)
        |      AS old_hash
        |  FROM documents WHERE doc_id % 11 != 3
        |  UNION ALL
        |  SELECT -doc_id, source, sha256(text) FROM documents
        |  WHERE doc_id % 17 = 5
        |), j AS (
        |  SELECT coalesce(c.source, p.old_source) AS source,
        |    CASE WHEN p.old_hash IS NULL THEN 'added'
        |         WHEN c.new_hash IS NULL THEN 'removed'
        |         WHEN p.old_hash != c.new_hash THEN 'changed'
        |         ELSE 'unchanged' END AS status,
        |    coalesce(c.doc_id, p.doc_id) AS doc_id
        |  FROM prev p FULL OUTER JOIN cur c USING (doc_id)
        |)
        |SELECT source, status, count(*)::BIGINT AS n_docs,
        |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
        |FROM j GROUP BY 1, 2 ORDER BY source, status""".stripMargin,

  )
}
