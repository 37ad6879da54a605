package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.ext._
import OraclePreludes._

/** Deduplication-family queries — split from ExtQueries (registration + DuckDB oracle
  * side by side; ground rules in [[ExtQueries]]).
  */
object OracleDedup {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_threshold_hist" -> ((s, dir) => Dedup.thresholdHist(s, dir)),
    "dedup_winnow_clusters" -> ((s, dir) => Dedup.winnowClusters(s, dir)),
    "corpus_firewall13" -> ((s, dir) => Dedup.firewall13(s, dir)),
    // ------------------------------------------------ dedup
    "dedup_exact" -> ((s, dir) => Dedup.exact(s, dir)),
    "dedup_bow" -> ((s, dir) => Dedup.bagOfWords(s, dir)),
    "dedup_ngram_pairs" -> ((s, dir) => Dedup.ngramJaccardPairs(s, dir)),
    "dedup_simhash" -> ((s, dir) => Dedup.simhash(s, dir)),
    "dedup_simhash_pairs" -> ((s, dir) => Dedup.simhashPairs(s, dir)),
    "dedup_bucket_audit" -> ((s, dir) => Dedup.bucketAudit(s, dir)),
    "dedup_shingle_audit" -> ((s, dir) => Dedup.shingleAudit(s, dir)),
    "dedup_minhash_pairs" -> ((s, dir) => Dedup.minhashPairs(s, dir)),
    "dedup_minhash_recall" -> ((s, dir) => Dedup.minhashRecall(s, dir)),
    "dedup_embed_pairs" -> ((s, dir) => Dedup.embedCosinePairs(s, dir)),
    "dedup_srp_occupancy" -> ((s, dir) => Dedup.srpOccupancy(s, dir)),
    "dedup_clusters" -> ((s, dir) => Dedup.simhashClusters(s, dir)),
    "dedup_cluster_sizes" -> ((s, dir) => Dedup.clusterSizeHist(s, dir)),
    "dedup_semantic_clusters" -> ((s, dir) => Dedup.semanticClusters(s, dir)),
    "dedup_canonical" -> ((s, dir) => Dedup.canonicalByQuality(s, dir)),
    "dedup_incremental" -> ((s, dir) =>
      Dedup.incremental(s, dir).orderBy(col("doc_id"))),
    "dedup_containment" -> ((s, dir) => Dedup.containmentPairs(s, dir)),
    "dedup_substring" -> ((s, dir) => Dedup.substringSpans(s, dir)),
    "dedup_span_coverage" -> ((s, dir) => Dedup.spanCoverage(s, dir)),
    "dedup_span_removal" -> ((s, dir) => Dedup.spanRemoval(s, dir)),
    "dedup_source_stats" -> ((s, dir) => Dedup.dupStats(s, dir)),
    "dedup_source_overlap" -> ((s, dir) => Dedup.sourceOverlap(s, dir)),
    "dedup_pagerank" -> ((s, dir) => Dedup.pagerank(s, dir)),
    "dedup_triangles" -> ((s, dir) => Dedup.triangles(s, dir)),
  )

  def oracleSql: Map[String, String] = Map(
    // Winnow-fingerprint candidate clusters (multi-doc groups only); the
    // fingerprint is the Karp-Rabin min-window hash — see text_winnow for
    // the exact-replay notes.
    "dedup_winnow_clusters" ->
      """WITH cp AS (
        |  SELECT doc_id,
        |    list_transform(regexp_extract_all(text, '.', 0, 's'),
        |                   x -> unicode(x)) AS cps
        |  FROM documents
        |), f AS (
        |  SELECT doc_id,
        |    list_min(list_transform(range(0, greatest(len(cps) - 15, 1)),
        |      i -> list_reduce(list_prepend(0::BIGINT, cps[i+1:i+16]),
        |        (h, c) -> ((h::HUGEINT * 257 + c)
        |                   % 2305843009213693951)::BIGINT)))
        |      AS fingerprint_h
        |  FROM cp
        |)
        |SELECT min(doc_id)::BIGINT AS canonical_doc_id, fingerprint_h,
        |  count(*)::BIGINT AS n_docs
        |FROM f GROUP BY fingerprint_h HAVING count(*) >= 2
        |ORDER BY canonical_doc_id""".stripMargin,

    // GPT-3-style exact 13-gram firewall: ANY shared 13-gram with the
    // training split marks the held-out doc contaminated. r16: the
    // 13-gram identity is the family's 60-bit md5 prefix (the same
    // `('0x' || substring(md5, 1, 15))::BIGINT` as the T0 pipelines),
    // replayed here so both engines distinct/join on the same value.
    "corpus_firewall13" ->
      """WITH toks13 AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                             x -> x != '') AS t
        |  FROM documents
        |), sh13 AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 11),
        |    i -> ('0x' || substring(md5(array_to_string(t[i:i+12], ' ')),
        |                            1, 15))::BIGINT)) AS hs
        |  FROM toks13 WHERE len(t) >= 13
        |), bench AS (
        |  SELECT doc_id, unnest(hs) AS h FROM sh13 WHERE doc_id % 17 = 0
        |), tset AS (
        |  SELECT DISTINCT unnest(hs) AS h FROM sh13 WHERE doc_id % 17 != 0
        |), tot AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_13grams FROM bench GROUP BY 1
        |), hit AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_hits
        |  FROM bench WHERE h IN (SELECT h FROM tset) GROUP BY 1
        |)
        |SELECT t.doc_id, t.n_13grams,
        |  coalesce(h.n_hits, 0)::BIGINT AS n_hits,
        |  (coalesce(h.n_hits, 0) * 1000000 // t.n_13grams)::BIGINT AS hit_ppm,
        |  coalesce(h.n_hits, 0) > 0 AS contaminated
        |FROM tot t LEFT JOIN hit h USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,

    "dedup_exact" ->
      """SELECT sha256(text) AS content_hash, min(doc_id) AS canonical_doc_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY sha256(text) ORDER BY canonical_doc_id""".stripMargin,

    // Shingle-df census: the ScaleKnobs.shingleDfCap audit row — distinct
    // shingles, candidate buckets, max df, the derived cap, and the
    // bucket/pair mass the cap excludes. Same 60-bit md5 identity as the
    // pair pipelines, replayed exactly.
    "dedup_shingle_audit" -> (toks + ", " + OraclePreludes.shingleCapCte +
      """, pos AS (
        |  SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
        |  FROM toks WHERE len(t) >= 3
        |), shh AS (
        |  SELECT DISTINCT doc_id,
        |    ('0x' || substring(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]),
        |                       1, 15))::BIGINT AS sh_h
        |  FROM pos
        |), dfs AS (
        |  SELECT sh_h, count(*)::BIGINT AS df FROM shh GROUP BY 1
        |)
        |SELECT count(*)::BIGINT AS n_shingles,
        |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_buckets,
        |  max(df)::BIGINT AS max_df,
        |  (SELECT cap FROM sdc) AS df_cap,
        |  CAST(sum(CASE WHEN df > (SELECT cap FROM sdc) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_over_cap,
        |  CAST(sum(CASE WHEN df > (SELECT cap FROM sdc)
        |    THEN df * (df - 1) // 2 ELSE 0 END) AS BIGINT)
        |    AS excluded_pair_mass,
        |  CAST(sum(CASE WHEN df BETWEEN 2 AND (SELECT cap FROM sdc)
        |    THEN df * (df - 1) // 2 ELSE 0 END) AS BIGINT)
        |    AS kept_pair_mass
        |FROM dfs""".stripMargin),

    "dedup_bow" -> (toks +
      """SELECT md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS bow_hash,
        |  min(doc_id) AS canonical_doc_id, count(*) AS n_copies
        |FROM toks GROUP BY 1 ORDER BY canonical_doc_id""".stripMargin),

    // The blocking key is the engine's 60-bit md5 shingle hash and the
    // df cap is the derived 8*ceil(log2 n) rule — replayed exactly, so
    // a hash collision or a cap change lands identically on both sides.
    "dedup_ngram_pairs" -> (shingles3 + ", " + OraclePreludes.shingleCapCte +
      """, ex AS (
        |  SELECT doc_id, unnest(sh) AS shingle FROM sh
        |), exh AS (
        |  SELECT DISTINCT doc_id,
        |    ('0x' || substring(md5(shingle), 1, 15))::BIGINT AS sh_h
        |  FROM ex
        |), sizes AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_sh FROM exh GROUP BY 1
        |), rare AS (
        |  SELECT doc_id, sh_h FROM (
        |    SELECT doc_id, sh_h,
        |      count(*) OVER (PARTITION BY sh_h) AS df
        |    FROM exh) WHERE df <= (SELECT cap FROM sdc)
        |), pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_rare
        |  FROM rare a JOIN rare b
        |    ON a.sh_h = b.sh_h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b, shared_rare,
        |  shared_rare * 1000000 // (sa.n_sh + sb.n_sh - shared_rare) AS jaccard_ppm
        |FROM pairs
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE shared_rare * 1000000 // (sa.n_sh + sb.n_sh - shared_rare) >= 100000
        |ORDER BY doc_a, doc_b""".stripMargin),

    // Blocked-candidate Jaccard decile histogram (threshold 0).
    "dedup_threshold_hist" -> (shingles3 + ", " + OraclePreludes.shingleCapCte +
      """, ex AS (
        |  SELECT doc_id, unnest(sh) AS shingle FROM sh
        |), exh AS (
        |  SELECT DISTINCT doc_id,
        |    ('0x' || substring(md5(shingle), 1, 15))::BIGINT AS sh_h
        |  FROM ex
        |), sizes AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_sh FROM exh GROUP BY 1
        |), rare AS (
        |  SELECT doc_id, sh_h FROM (
        |    SELECT doc_id, sh_h,
        |      count(*) OVER (PARTITION BY sh_h) AS df
        |    FROM exh) WHERE df <= (SELECT cap FROM sdc)
        |), pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_rare
        |  FROM rare a JOIN rare b
        |    ON a.sh_h = b.sh_h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), jp AS (
        |  SELECT shared_rare * 1000000
        |      // (sa.n_sh + sb.n_sh - shared_rare) AS jaccard_ppm
        |  FROM pairs
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |)
        |SELECT CAST(jaccard_ppm // 100000 AS BIGINT) AS bucket,
        |  count(*)::BIGINT AS n_pairs,
        |  min(jaccard_ppm)::BIGINT AS min_ppm,
        |  max(jaccard_ppm)::BIGINT AS max_ppm
        |FROM jp GROUP BY 1 ORDER BY bucket""".stripMargin),

    "dedup_simhash" -> (simhashSig +
      """SELECT doc_id, simhash FROM sig ORDER BY doc_id""".stripMargin),

    "dedup_simhash_pairs" -> (simhashDerivedPairs +
      """
        |SELECT doc_a, doc_b, hamming FROM pairs
        |ORDER BY doc_a, doc_b""".stripMargin),

    // Band-bucket occupancy census + family-cap audit (the hbc CTE
    // replays ScaleKnobs.hammingBucketCap from count(*)).
    "dedup_bucket_audit" -> (simhashDerivedPairs +
      """, occ AS (
        |  SELECT band, band_val, count(*)::BIGINT AS s
        |  FROM sbv GROUP BY 1, 2
        |)
        |SELECT band, count(*)::BIGINT AS n_buckets,
        |  CAST(sum(CASE WHEN s >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi,
        |  max(s)::BIGINT AS max_bucket,
        |  CAST(sum(CASE WHEN s > (SELECT cap FROM hbc) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_over_cap,
        |  (SELECT cap FROM hbc) AS bucket_cap
        |FROM occ GROUP BY band ORDER BY band""".stripMargin),

    "dedup_clusters" -> ("WITH RECURSIVE " +
      simhashDerivedPairs.stripPrefix("WITH ") + simhashDerivedCcChain +
      """
        |SELECT doc_id, cluster_id FROM cl ORDER BY doc_id""".stripMargin),

    // Cluster-size histogram over the same CC chain.
    "dedup_cluster_sizes" -> ("WITH RECURSIVE " +
      simhashDerivedPairs.stripPrefix("WITH ") + simhashDerivedCcChain +
      """, cs AS (
        |  SELECT cluster_id, count(*)::BIGINT AS cluster_size
        |  FROM cl GROUP BY 1
        |)
        |SELECT cluster_size, count(*)::BIGINT AS n_clusters,
        |  (cluster_size * count(*))::BIGINT AS n_docs
        |FROM cs GROUP BY 1 ORDER BY cluster_size""".stripMargin),

    // Canonical-by-quality: the dedup_clusters chain + the corpus_clean
    // gate; survivor = keep-first, longest, then lowest id.
    "dedup_canonical" -> ("WITH RECURSIVE " +
      simhashDerivedPairs.stripPrefix("WITH ") + simhashDerivedCcChain +
      """, """.stripMargin + docQuality + """, qq AS (
        |  SELECT doc_id, keep FROM dq
        |), mem AS (
        |  SELECT cl.cluster_id, cl.doc_id, q.keep, d.n_chars
        |  FROM cl JOIN qq q USING (doc_id) JOIN documents d USING (doc_id)
        |), pick AS (
        |  SELECT cluster_id, doc_id, n_chars, keep,
        |    row_number() OVER (PARTITION BY cluster_id
        |      ORDER BY CASE WHEN keep THEN 0 ELSE 1 END, n_chars DESC, doc_id)
        |      AS rn,
        |    count(*) OVER (PARTITION BY cluster_id) AS n_members,
        |    sum(CASE WHEN keep THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY cluster_id) AS n_kept
        |  FROM mem
        |)
        |SELECT cluster_id, n_members::BIGINT AS n_members,
        |  n_kept::BIGINT AS n_kept, doc_id AS canonical_doc_id,
        |  n_chars AS canonical_chars, keep AS canonical_kept
        |FROM pick WHERE rn = 1 AND n_members >= 2
        |ORDER BY cluster_id""".stripMargin),

    "dedup_minhash_pairs" -> (shingles3 +
      """, ex AS (
        |  SELECT doc_id, ('0x' || substring(md5(unnest(sh)), 1, 12))::BIGINT AS h
        |  FROM sh
        |), sig AS (
        |  SELECT doc_id, i,
        |    min((h * (2*i + 3) + 7919*(i + 1)) % 2305843009213693951) AS mh
        |  FROM ex, range(0, 16) t(i) GROUP BY 1, 2
        |), bands AS (
        |  SELECT doc_id, i // 4 AS band,
        |    md5(string_agg(mh::VARCHAR, ',' ORDER BY i)) AS bucket
        |  FROM sig GROUP BY doc_id, i // 4
        |), """.stripMargin + OraclePreludes.bucketCapCte +
      """, bok AS (
        |  -- r14 family cap (ScaleKnobs.hammingBucketCap): a MinHash band
        |  -- bucket past the cap is an exact-duplicate family (all four
        |  -- permutation minima agree) — excluded from pair generation,
        |  -- like the Hamming chains. Measured max bucket 23 at sf10, so
        |  -- this is crawl-scale insurance, not a result change.
        |  SELECT band, bucket FROM bands GROUP BY 1, 2
        |  HAVING count(*) BETWEEN 2 AND (SELECT cap FROM hbc)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bok k
        |  JOIN bands a ON a.band = k.band AND a.bucket = k.bucket
        |  JOIN bands b ON b.band = k.band AND b.bucket = k.bucket
        |    AND a.doc_id < b.doc_id
        |), est AS (
        |  SELECT doc_a, doc_b,
        |    CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) * 1000000 // 16
        |         AS BIGINT) AS est_jaccard_ppm
        |  FROM cand
        |  JOIN sig sa ON sa.doc_id = doc_a
        |  JOIN sig sb ON sb.doc_id = doc_b AND sb.i = sa.i
        |  GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b, est_jaccard_ppm FROM est
        |WHERE est_jaccard_ppm >= 250000 ORDER BY doc_a, doc_b""".stripMargin),

    // LSH index QA: recall/precision of the banded MinHash candidates vs
    // exact blocked Jaccard >= 0.5 — both sides are the pipelines of
    // dedup_ngram_pairs / dedup_minhash_pairs above, CTEs renamed apart.
    "dedup_minhash_recall" -> (shingles3 + ", " + OraclePreludes.shingleCapCte +
      """, gex AS (
        |  SELECT doc_id, unnest(sh) AS shingle FROM sh
        |), gexh AS (
        |  SELECT DISTINCT doc_id,
        |    ('0x' || substring(md5(shingle), 1, 15))::BIGINT AS sh_h
        |  FROM gex
        |), gsizes AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_sh FROM gexh GROUP BY 1
        |), grare AS (
        |  SELECT doc_id, sh_h FROM (
        |    SELECT doc_id, sh_h,
        |      count(*) OVER (PARTITION BY sh_h) AS df
        |    FROM gexh) WHERE df <= (SELECT cap FROM sdc)
        |), gpairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_rare
        |  FROM grare a JOIN grare b
        |    ON a.sh_h = b.sh_h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), truth AS (
        |  SELECT doc_a, doc_b FROM gpairs
        |  JOIN gsizes sa ON sa.doc_id = doc_a
        |  JOIN gsizes sb ON sb.doc_id = doc_b
        |  WHERE shared_rare * 1000000
        |    // (sa.n_sh + sb.n_sh - shared_rare) >= 500000
        |), mex AS (
        |  SELECT doc_id, ('0x' || substring(md5(unnest(sh)), 1, 12))::BIGINT AS h
        |  FROM sh
        |), msig AS (
        |  SELECT doc_id, i,
        |    min((h * (2*i + 3) + 7919*(i + 1)) % 2305843009213693951) AS mh
        |  FROM mex, range(0, 16) t(i) GROUP BY 1, 2
        |), mbands AS (
        |  SELECT doc_id, i // 4 AS band,
        |    md5(string_agg(mh::VARCHAR, ',' ORDER BY i)) AS bucket
        |  FROM msig GROUP BY doc_id, i // 4
        |), """.stripMargin + OraclePreludes.bucketCapCte +
      """, mbok AS (
        |  SELECT band, bucket FROM mbands GROUP BY 1, 2
        |  HAVING count(*) BETWEEN 2 AND (SELECT cap FROM hbc)
        |), mcand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM mbok k
        |  JOIN mbands a ON a.band = k.band AND a.bucket = k.bucket
        |  JOIN mbands b ON b.band = k.band AND b.bucket = k.bucket
        |    AND a.doc_id < b.doc_id
        |), lsh AS (
        |  SELECT doc_a, doc_b FROM (
        |    SELECT doc_a, doc_b,
        |      CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) * 1000000 // 16
        |           AS BIGINT) AS est
        |    FROM mcand
        |    JOIN msig sa ON sa.doc_id = doc_a
        |    JOIN msig sb ON sb.doc_id = doc_b AND sb.i = sa.i
        |    GROUP BY 1, 2)
        |  WHERE est >= 250000
        |), counts AS (
        |  SELECT
        |    (SELECT count(*) FROM truth) AS n_truth,
        |    (SELECT count(*) FROM lsh) AS n_lsh,
        |    (SELECT count(*) FROM truth t WHERE EXISTS (
        |       SELECT 1 FROM lsh l
        |       WHERE l.doc_a = t.doc_a AND l.doc_b = t.doc_b)) AS n_hit
        |)
        |SELECT n_truth, n_lsh, n_hit,
        |  n_hit * 1000000 // greatest(n_truth, 1) AS recall_ppm,
        |  n_hit * 1000000 // greatest(n_lsh, 1) AS precision_ppm
        |FROM counts""".stripMargin),

    "dedup_embed_pairs" -> (quantized + srpPairChain +
      """SELECT va AS vec_a, vb AS vec_b, dot,
        |  CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb
        |FROM sprs ORDER BY vec_a, vec_b""".stripMargin),

    // SRP bucket-occupancy census over the SAME derived band width the
    // pair build uses (srpBandChain + nbc) — per band: occupied buckets,
    // vectors, largest bucket, integer-milli mean.
    "dedup_srp_occupancy" -> (quantized + srpBandChain +
      """, occ AS (
        |  SELECT band, bv, count(*)::BIGINT AS occ FROM bands GROUP BY 1, 2
        |)
        |SELECT band::BIGINT AS band, count(*)::BIGINT AS n_buckets,
        |  CAST(sum(occ) AS BIGINT) AS n_vectors,
        |  max(occ)::BIGINT AS max_bucket,
        |  CAST(sum(occ) * 1000 // count(*) AS BIGINT) AS mean_bucket_milli
        |FROM occ GROUP BY 1 ORDER BY band""".stripMargin),

    // SemDeDup shape: connected components over the SRP cosine pair
    // graph; canonical member = the one equal to its (min-id) label.
    // The pair CTE the recursion joins is MATERIALIZED: without the
    // hint DuckDB re-inlines the whole SRP chain into every recursive
    // iteration — measured at sf1: hours of CPU vs 90 s with sprsm
    // (identical results; it is purely an evaluation hint).
    "dedup_semantic_clusters" -> ("WITH RECURSIVE " +
      quantized.stripPrefix("WITH ") + srpPairChain +
      """, sprsm AS MATERIALIZED (
        |  SELECT va, vb FROM sprs
        |), rr(x, m) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT e.db, rr.m FROM rr JOIN
        |    (SELECT va AS da, vb AS db FROM sprsm
        |     UNION ALL SELECT vb, va FROM sprsm) e ON e.da = rr.x
        |), cl AS (
        |  SELECT x AS vec_id, min(m) AS cluster_id FROM rr GROUP BY x
        |)
        |SELECT vec_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
        |  vec_id = cluster_id AS keep
        |FROM cl ORDER BY vec_id""".stripMargin),

    "dedup_incremental" ->
      """WITH h AS (
        |  SELECT doc_id, sha256(text) AS content_hash FROM documents
        |), corpus AS (
        |  SELECT content_hash, min(doc_id) AS corpus_canonical
        |  FROM h WHERE doc_id % 10 < 8 GROUP BY 1
        |), batch AS (
        |  SELECT doc_id, content_hash,
        |    min(doc_id) OVER (PARTITION BY content_hash) AS batch_min
        |  FROM h WHERE doc_id % 10 >= 8
        |)
        |SELECT b.doc_id, b.content_hash,
        |  CASE WHEN c.corpus_canonical IS NOT NULL THEN 'dup_of_corpus'
        |       WHEN b.batch_min < b.doc_id THEN 'dup_in_batch'
        |       ELSE 'new' END AS status,
        |  coalesce(c.corpus_canonical, b.batch_min) AS canonical_doc_id
        |FROM batch b LEFT JOIN corpus c USING (content_hash)
        |ORDER BY doc_id""".stripMargin,

    "dedup_containment" -> (shingles3 + ", " + OraclePreludes.shingleCapCte +
      """, ex AS (
        |  SELECT doc_id, unnest(sh) AS shingle FROM sh
        |), exh AS (
        |  SELECT DISTINCT doc_id,
        |    ('0x' || substring(md5(shingle), 1, 15))::BIGINT AS sh_h
        |  FROM ex
        |), sizes AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_sh FROM exh GROUP BY 1
        |), rare AS (
        |  SELECT doc_id, sh_h FROM (
        |    SELECT doc_id, sh_h,
        |      count(*) OVER (PARTITION BY sh_h) AS df
        |    FROM exh) WHERE df <= (SELECT cap FROM sdc)
        |), pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_rare
        |  FROM rare a JOIN rare b
        |    ON a.sh_h = b.sh_h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b, shared_rare, sa.n_sh AS n_a, sb.n_sh AS n_b,
        |  shared_rare * 1000000 // least(sa.n_sh, sb.n_sh) AS containment_ppm
        |FROM pairs
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE shared_rare * 1000000 // least(sa.n_sh, sb.n_sh) >= 400000
        |ORDER BY doc_a, doc_b""".stripMargin),

    // Positional (not distinct-set) shingles: every occurrence keeps its
    // token position; a run of consecutive matches on one (doc_a, doc_b,
    // pa-pb) diagonal is a maximal shared span (gaps-and-islands).
    "dedup_substring" -> (spanChain +
      """SELECT doc_a, doc_b, a_start, b_start, span_tokens
        |FROM spans
        |ORDER BY doc_a, doc_b, a_start, b_start""".stripMargin),

    // Interval-union sweep over each doc's spans (both sides): running
    // max of ends splits chain-overlaps into islands; an island's union
    // is contiguous, so coverage = max(e) - min(s).
    "dedup_span_coverage" -> (spanChain +
      """, iv AS (
        |  SELECT DISTINCT doc_id, s, e FROM (
        |    SELECT doc_a AS doc_id, a_start AS s,
        |      a_start + span_tokens AS e FROM spans
        |    UNION ALL
        |    SELECT doc_b, b_start, b_start + span_tokens FROM spans)
        |), mrk AS (
        |  SELECT doc_id, s, e,
        |    max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM iv
        |), cum AS (
        |  SELECT doc_id, s, e,
        |    sum(CASE WHEN pmax IS NULL OR s >= pmax THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY s, e
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        |  FROM mrk
        |), cov AS (
        |  SELECT doc_id, isl, max(e) - min(s) AS covered
        |  FROM cum GROUP BY 1, 2
        |), agg AS (
        |  SELECT doc_id, sum(covered) AS covered_tokens,
        |    count(*) AS n_spans
        |  FROM cov GROUP BY 1
        |)
        |SELECT a.doc_id, len(t.t)::BIGINT AS n_tokens,
        |  a.covered_tokens::BIGINT AS covered_tokens,
        |  a.n_spans::BIGINT AS n_spans,
        |  (a.covered_tokens * 1000000 // len(t.t))::BIGINT AS dup_ppm
        |FROM agg a JOIN toks t USING (doc_id)
        |ORDER BY a.doc_id""".stripMargin),

    // Substring removal: cut the merged islands out of every doc; the
    // md5 of the surviving token stream proves the reconstruction.
    "dedup_span_removal" -> (spanChain +
      """, iv AS (
        |  SELECT DISTINCT doc_id, s, e FROM (
        |    SELECT doc_a AS doc_id, a_start AS s,
        |      a_start + span_tokens AS e FROM spans
        |    UNION ALL
        |    SELECT doc_b, b_start, b_start + span_tokens FROM spans)
        |), mrk AS (
        |  SELECT doc_id, s, e,
        |    max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM iv
        |), cum AS (
        |  SELECT doc_id, s, e,
        |    sum(CASE WHEN pmax IS NULL OR s >= pmax THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY s, e
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        |  FROM mrk
        |), mi AS (
        |  SELECT doc_id, isl, min(s) AS s, max(e) AS e
        |  FROM cum GROUP BY 1, 2
        |), ia AS (
        |  SELECT doc_id, list({'s': s, 'e': e} ORDER BY s, e) AS ivs
        |  FROM mi GROUP BY 1
        |), cut AS (
        |  SELECT t.doc_id, t.t,
        |    list_transform(
        |      list_filter(list_zip(t.t, range(0, len(t.t))),
        |        z -> len(list_filter(coalesce(ia.ivs, []),
        |               v -> struct_extract(z, 2) >= v.s
        |                AND struct_extract(z, 2) < v.e)) = 0),
        |      z -> struct_extract(z, 1)) AS kept
        |  FROM toks t LEFT JOIN ia USING (doc_id)
        |)
        |SELECT doc_id, len(t)::BIGINT AS n_tokens,
        |  len(kept)::BIGINT AS kept_tokens,
        |  (len(t) - len(kept))::BIGINT AS removed_tokens,
        |  md5(coalesce(array_to_string(kept, ' '), '')) AS kept_md5
        |FROM cut ORDER BY doc_id""".stripMargin),

    "dedup_pagerank" -> (simhashDerivedPairs +
      """, edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL
        |  SELECT doc_b AS src, doc_a AS dst FROM pairs
        |), deg AS (
        |  SELECT src, count(*)::BIGINT AS deg FROM edges GROUP BY src
        |), r0 AS (
        |  SELECT doc_id, 1000000::BIGINT AS pr_rank FROM documents
        |), r1 AS (
        |  SELECT d.doc_id,
        |    (150000 + (85 * coalesce(s.s, 0)) // 100)::BIGINT AS pr_rank
        |  FROM documents d LEFT JOIN (
        |    SELECT dst AS doc_id, sum(r0.pr_rank // deg.deg)::BIGINT AS s
        |    FROM edges
        |    JOIN r0 ON r0.doc_id = edges.src
        |    JOIN deg ON deg.src = edges.src
        |    GROUP BY dst) s ON s.doc_id = d.doc_id
        |), r2 AS (
        |  SELECT d.doc_id,
        |    (150000 + (85 * coalesce(s.s, 0)) // 100)::BIGINT AS pr_rank
        |  FROM documents d LEFT JOIN (
        |    SELECT dst AS doc_id, sum(r1.pr_rank // deg.deg)::BIGINT AS s
        |    FROM edges
        |    JOIN r1 ON r1.doc_id = edges.src
        |    JOIN deg ON deg.src = edges.src
        |    GROUP BY dst) s ON s.doc_id = d.doc_id
        |)
        |SELECT doc_id, pr_rank FROM r2 ORDER BY doc_id""".stripMargin),

    "dedup_source_stats" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
        |  count(DISTINCT text)::BIGINT AS n_distinct,
        |  (count(*) - count(DISTINCT text))::BIGINT AS n_dup_rows,
        |  ((count(*) - count(DISTINCT text)) * 1000000 // count(*))::BIGINT
        |    AS dup_ppm
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // Cross-source shingle-overlap matrix via per-shingle source
    // bitmasks — the pair expansion runs over the tiny mask census.
    // Shingle identity is the engine's 60-bit md5 prefix (r15) —
    // replayed exactly, like the pair pipelines.
    "dedup_source_overlap" -> (shingles3 +
      """, shx AS (
        |  SELECT d.source,
        |    ('0x' || substring(md5(unnest(sh.sh)), 1, 15))::BIGINT AS shingle
        |  FROM sh JOIN documents d USING (doc_id)
        |), si AS (
        |  SELECT source, row_number() OVER (ORDER BY source) - 1 AS idx
        |  FROM (SELECT DISTINCT source FROM documents)
        |), ss AS (
        |  SELECT DISTINCT si.idx, shingle FROM shx JOIN si USING (source)
        |), pc AS (
        |  SELECT idx, count(*)::BIGINT AS n_sh FROM ss GROUP BY 1
        |), mk AS (
        |  SELECT shingle, bit_or(1::BIGINT << idx::INT) AS mask
        |  FROM ss GROUP BY 1
        |), mc AS (
        |  SELECT mask, count(*)::BIGINT AS cnt FROM mk GROUP BY 1
        |), pr AS (
        |  SELECT ti.i AS idx_a, tj.j AS idx_b,
        |    sum(cnt)::BIGINT AS shared_shingles
        |  FROM mc, range(0, 63) ti(i), range(0, 63) tj(j)
        |  WHERE ti.i < tj.j
        |    AND ((mask >> ti.i::INT) % 2) = 1
        |    AND ((mask >> tj.j::INT) % 2) = 1
        |  GROUP BY 1, 2
        |)
        |SELECT sa.source AS src_a, sb.source AS src_b, pr.shared_shingles,
        |  a.n_sh AS n_a, b.n_sh AS n_b,
        |  (pr.shared_shingles * 1000000
        |   // (a.n_sh + b.n_sh - pr.shared_shingles))::BIGINT AS jaccard_ppm
        |FROM pr
        |JOIN pc a ON a.idx = pr.idx_a JOIN pc b ON b.idx = pr.idx_b
        |JOIN si sa ON sa.idx = pr.idx_a JOIN si sb ON sb.idx = pr.idx_b
        |ORDER BY src_a, src_b""".stripMargin),

    // Triangle census over the derived-geometry SimHash edge list the
    // pair query states, SCALE-BOUNDED by the derived hub cap (r13):
    // `tcc.cap` replays ScaleKnobs.triangleDegreeCap = 32·⌈log2 n⌉ from
    // the oracle's own count(*); vertices above the cap are excluded
    // from wedge formation but keep their (full-graph) degree row with
    // triangles counted among surviving wedges only — exactly
    // Dedup.trianglesFromPairs(maxDegree) semantics.
    "dedup_triangles" -> (simhashDerivedPairs +
      """, tcc AS (
        |  SELECT 32::BIGINT * greatest(1,
        |    (SELECT min(b) FROM range(0, 63) t(b)
        |     WHERE (1::BIGINT << b) >= (SELECT count(*) FROM documents)))
        |    AS cap
        |), deg AS (
        |  SELECT v AS doc_id, count(*)::BIGINT AS degree
        |  FROM (SELECT doc_a AS v FROM pairs UNION ALL SELECT doc_b FROM pairs)
        |  GROUP BY 1
        |), ec AS (
        |  SELECT p.doc_a, p.doc_b FROM pairs p
        |  JOIN deg da ON da.doc_id = p.doc_a
        |  JOIN deg db ON db.doc_id = p.doc_b
        |  WHERE da.degree <= (SELECT cap FROM tcc)
        |    AND db.degree <= (SELECT cap FROM tcc)
        |), tri AS (
        |  SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
        |  FROM ec e1
        |  JOIN ec e2 ON e2.doc_a = e1.doc_b
        |  JOIN ec e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
        |), pt AS (
        |  SELECT v AS doc_id, count(*)::BIGINT AS n_triangles
        |  FROM (SELECT unnest([a, b, c]) AS v FROM tri) GROUP BY 1
        |)
        |SELECT d.doc_id, d.degree,
        |  coalesce(p.n_triangles, 0)::BIGINT AS n_triangles,
        |  CASE WHEN d.degree >= 2 THEN
        |    coalesce(p.n_triangles, 0) * 2000000 // (d.degree * (d.degree - 1))
        |  ELSE 0 END::BIGINT AS closure_ppm
        |FROM deg d LEFT JOIN pt p USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin),

  )
}
