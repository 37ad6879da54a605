package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.ext._
import OraclePreludes._

/** ANN / similarity-search queries — split from ExtQueries (registration + DuckDB oracle
  * side by side; ground rules in [[ExtQueries]]).
  */
object OracleAnn {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_cell_balance" -> ((s, dir) => Similarity.cellBalance(s, dir)),
    "ann_nprobe_sweep" -> ((s, dir) => Similarity.nprobeSweep(s, dir)),
    // ------------------------------------------------ similarity search
    "ann_bruteforce" -> ((s, dir) => Similarity.bruteForceTopK(s, dir)),
    "ann_ivf" -> ((s, dir) => Similarity.ivfTopK(s, dir)),
    "ann_label_centroids" -> ((s, dir) => Similarity.labelCentroidSim(s, dir)),
    "ann_kmeans" -> ((s, dir) => Similarity.kmeansCells(s, dir)),
    "ann_quantize" -> ((s, dir) => Similarity.quantizeInt8(s, dir)),
    "ann_dim_stats" -> ((s, dir) => Similarity.dimStats(s, dir)),
    "ann_ivf_trained" -> ((s, dir) => Similarity.ivfTrainedTopK(s, dir)),
    "ann_index_update" -> ((s, dir) => Similarity.ivfIndexUpdate(s, dir)),
    "ann_ivfpq_search" -> ((s, dir) => Similarity.ivfPqTopK(s, dir)),
    "ann_ivfpq_recall" -> ((s, dir) => Similarity.ivfPqRecall(s, dir)),
    "ann_pq_codes" -> ((s, dir) => Similarity.pqCodes(s, dir)),
    "ann_pq_drift" -> ((s, dir) => Similarity.pqDriftAudit(s, dir)),
    "ann_pq_search" -> ((s, dir) => Similarity.pqSearchTopK(s, dir)),
    "ann_pq_rerank" -> ((s, dir) => Similarity.pqRerankTopK(s, dir)),
    "ann_hybrid_rrf" -> ((s, dir) => Similarity.hybridRrf(s, dir)),
    "ann_srp_topk" -> ((s, dir) => Similarity.srpTopK(s, dir)),
    "ann_srp_recall" -> ((s, dir) => Similarity.srpRecall(s, dir)),
    "corpus_cell_quality" -> ((s, dir) => Similarity.cellQuality(s, dir)),
    "ann_pq_recall" -> ((s, dir) => Similarity.pqRecall(s, dir)),
    "ann_range_search" -> ((s, dir) => Similarity.ivfRangeSearch(s, dir)),
    "ann_filtered_search" -> ((s, dir) => Similarity.filteredTopK(s, dir)),
    "ann_knob_report" -> ((s, dir) => Similarity.knobReport(s, dir)),
  )

  def oracleSql: Map[String, String] = Map(
    // The scale-derived knob values for THIS corpus, replayed from the
    // same integer rules (ceil(log2 n) via the min-power-of-two scan,
    // panel modulus via ceiling division) — one row.
    "ann_knob_report" ->
      """WITH ne AS (
        |  SELECT count(*)::BIGINT AS n_embeddings FROM embeddings
        |), nd AS (
        |  SELECT count(*)::BIGINT AS n_documents FROM documents
        |), b AS (
        |  SELECT CASE WHEN (SELECT n_embeddings FROM ne) <= 1 THEN 4
        |         ELSE least(15, greatest(4,
        |           (SELECT min(b) FROM range(0, 63) t(b)
        |            WHERE (1::BIGINT << b) >=
        |              (SELECT n_embeddings FROM ne)) - 7)) END::BIGINT
        |    AS srp_bits
        |), ic AS (
        |  SELECT CASE WHEN (SELECT n_embeddings FROM ne) <= 1 THEN 16
        |         ELSE greatest(16, 1::BIGINT <<
        |           (((SELECT min(b) FROM range(0, 63) t(b)
        |              WHERE (1::BIGINT << b) >=
        |                (SELECT n_embeddings FROM ne)) + 1) // 2)) END::BIGINT
        |    AS ivf_cells
        |), sg AS (
        |  SELECT CASE WHEN (SELECT n_documents FROM nd) <= 1 THEN 15
        |         ELSE least(30, greatest(15,
        |           (SELECT min(b) FROM range(0, 63) t(b)
        |            WHERE (1::BIGINT << b) >=
        |              (SELECT n_documents FROM nd)) - 1)) END::BIGINT
        |    AS sig_bits
        |), tc AS (
        |  SELECT CASE WHEN (SELECT n_documents FROM nd) <= 1 THEN 32
        |         ELSE 32 * greatest(1,
        |           (SELECT min(b) FROM range(0, 63) t(b)
        |            WHERE (1::BIGINT << b) >=
        |              (SELECT n_documents FROM nd))) END::BIGINT
        |    AS triangle_cap
        |), bc AS (
        |  SELECT CASE WHEN (SELECT n_documents FROM nd) <= 1 THEN 64
        |         ELSE 64 * greatest(1,
        |           (SELECT min(b) FROM range(0, 63) t(b)
        |            WHERE (1::BIGINT << b) >=
        |              (SELECT n_documents FROM nd))) END::BIGINT
        |    AS bucket_cap
        |), sdc AS (
        |  SELECT CASE WHEN (SELECT n_documents FROM nd) <= 1 THEN 8
        |         ELSE 8 * greatest(1,
        |           (SELECT min(b) FROM range(0, 63) t(b)
        |            WHERE (1::BIGINT << b) >=
        |              (SELECT n_documents FROM nd))) END::BIGINT
        |    AS shingle_df_cap
        |)
        |SELECT ne.n_embeddings, nd.n_documents, b.srp_bits,
        |  (b.srp_bits * 4)::BIGINT AS srp_planes,
        |  greatest(50, (ne.n_embeddings + 99) // 100)::BIGINT
        |    AS embed_query_mod,
        |  greatest(50, (nd.n_documents + 99) // 100)::BIGINT
        |    AS doc_query_mod,
        |  ic.ivf_cells,
        |  greatest(1, ne.n_embeddings // (64 * ic.ivf_cells))::BIGINT
        |    AS kmeans_train_mod,
        |  sg.sig_bits,
        |  ((8 * 4 * sg.sig_bits) // 60)::BIGINT AS sig_max_hamming,
        |  tc.triangle_cap, bc.bucket_cap, sdc.shingle_df_cap
        |FROM ne, nd, b, ic, sg, tc, bc, sdc""".stripMargin,
    "ann_bruteforce" -> (quantized +
      raw""", d AS (
        |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
        |    CAST(sum(q.q * v.q) AS BIGINT) AS dot
        |  FROM v q JOIN v ON q.i = v.i AND q.vec_id % $qmSql = 0
        |                 AND v.vec_id != q.vec_id
        |  GROUP BY 1, 2
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |                               ORDER BY dot DESC, neighbor_id) AS rank
        |  FROM d
        |)
        |SELECT query_id, rank, neighbor_id, dot FROM r
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin),

    // Hybrid RRF: dense brute-force top-10 (d/r, as ann_bruteforce) ⊕
    // lexical bigram tf-idf top-10 (toksh..lt, as text_tfidf_topk),
    // fused by integer reciprocal rank 1e6 // (60 + rank). BOTH panels
    // use the embedding-count modulus qmc (r11 ADVICE: per-corpus
    // moduli only coincided at their lcm, degenerating the fusion).
    "ann_hybrid_rrf" -> (quantized +
      raw""", d AS (
        |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
        |    CAST(sum(q.q * v.q) AS BIGINT) AS dot
        |  FROM v q JOIN v ON q.i = v.i AND q.vec_id % $qmSql = 0
        |                 AND v.vec_id != q.vec_id
        |  GROUP BY 1, 2
        |), dt AS (
        |  SELECT query_id, neighbor_id, rank::BIGINT AS dense_rank FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY dot DESC, neighbor_id) AS rank
        |    FROM d) WHERE rank <= 10
        |), toksh AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                             x -> x != '') AS t
        |  FROM documents
        |), tt AS (
        |  SELECT doc_id, ('0x' || substring(md5(t[p+1] || ' ' || t[p+2]),
        |                                    1, 15))::BIGINT AS term
        |  FROM (SELECT doc_id, t, unnest(range(0, len(t) - 1)) AS p
        |        FROM toksh WHERE len(t) >= 2)
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
        |    AND q.doc_id % $qmSql = 0 AND p.doc_id != q.doc_id
        |  GROUP BY 1, 2
        |), lt AS (
        |  SELECT query_id, neighbor_id, rank::BIGINT AS lex_rank FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, neighbor_id) AS rank
        |    FROM sc) WHERE rank <= 10
        |), fused AS (
        |  SELECT coalesce(dt.query_id, lt.query_id) AS query_id,
        |    coalesce(dt.neighbor_id, lt.neighbor_id) AS neighbor_id,
        |    dt.dense_rank, lt.lex_rank,
        |    coalesce(1000000 // (60 + dt.dense_rank), 0)
        |      + coalesce(1000000 // (60 + lt.lex_rank), 0) AS rrf_score
        |  FROM dt FULL OUTER JOIN lt
        |    ON dt.query_id = lt.query_id AND dt.neighbor_id = lt.neighbor_id
        |)
        |SELECT query_id, rank, neighbor_id, rrf_score, dense_rank, lex_rank
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY rrf_score DESC, neighbor_id)::BIGINT AS rank
        |  FROM fused) WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin),

    // ann_kmeans: two Lloyd iterations, all exact integer / floor-mean
    // arithmetic with explicit tie-breaks — DuckDB replays the training.
    "ann_kmeans" -> (kmeansFin +
      "SELECT vec_id, cell_id, dist FROM fin ORDER BY vec_id"),

    // nprobe tuning curve: one trained index, one exact baseline, four
    // probe widths. The replay mirrors the engine's one-pass shape: the
    // candidate dots are computed ONCE at the widest probe (cand8, which
    // carries each candidate cell's rank) and every narrower width is a
    // crank filter over it — identical rows to the per-width formulation
    // (a vector lives in exactly one cell, so the candidate set at width
    // p is exactly the crank<=p slice). The shared kmeans/vector CTEs
    // are MATERIALIZED so DuckDB stops re-inlining the training chain
    // into every width block — the spill that made this oracle
    // sf1-infeasible (>60 GB of temp) before.
    "ann_nprobe_sweep" -> (kmeansFin +
      raw""", vm AS MATERIALIZED (
        |  SELECT vec_id, i, q FROM v
        |), d2m AS MATERIALIZED (
        |  SELECT vec_id, cell_id, dist FROM d2
        |), finm AS MATERIALIZED (
        |  SELECT vec_id, cell_id FROM fin
        |), qp AS MATERIALIZED (
        |  -- the query panel, pre-filtered BEFORE the dim join: with the
        |  -- panel modulus left as a scalar subquery inside the join
        |  -- condition, the filter can land above the i-equi join and the
        |  -- intermediate is |v|^2 x 64 rows (measured: >70 GB of spill
        |  -- at sf1) instead of |panel| x |v| x 64.
        |  SELECT vec_id, i, q FROM vm WHERE vec_id % $qmSql = 0
        |), bfd AS (
        |  SELECT q.vec_id AS query_id, v2.vec_id AS neighbor_id,
        |    CAST(sum(q.q * v2.q) AS BIGINT) AS dot
        |  FROM qp q JOIN vm v2 ON q.i = v2.i AND v2.vec_id != q.vec_id
        |  GROUP BY 1, 2
        |), bf AS MATERIALIZED (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      row_number() OVER (PARTITION BY query_id
        |                         ORDER BY dot DESC, neighbor_id) AS rank
        |    FROM bfd) WHERE rank <= 10
        |), tot AS (
        |  SELECT count(*)::BIGINT AS n_true,
        |    count(DISTINCT query_id)::BIGINT AS n_queries
        |  FROM bf
        |), pr8 AS MATERIALIZED (
        |  SELECT vec_id AS query_id, cell_id, crank FROM (
        |    SELECT vec_id, cell_id,
        |      row_number() OVER (PARTITION BY vec_id
        |                         ORDER BY dist, cell_id) AS crank
        |    FROM d2m WHERE vec_id % $qmSql = 0) WHERE crank <= 8
        |), cand8 AS MATERIALIZED (
        |  SELECT p.query_id, a.vec_id AS neighbor_id, p.crank,
        |    CAST(sum(q.q * n.q) AS BIGINT) AS dot
        |  FROM pr8 p
        |  JOIN finm a ON a.cell_id = p.cell_id AND a.vec_id != p.query_id
        |  JOIN vm q ON q.vec_id = p.query_id
        |  JOIN vm n ON n.vec_id = a.vec_id AND n.i = q.i
        |  GROUP BY 1, 2, 3
        |)""".stripMargin +
      Seq(1, 2, 4, 8).map { p =>
        s""", top$p AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |      row_number() OVER (PARTITION BY query_id
           |                         ORDER BY dot DESC, neighbor_id) AS rank
           |    FROM cand8 WHERE crank <= $p) WHERE rank <= 10
           |), row$p AS (
           |  SELECT $p::BIGINT AS nprobe, n_queries, n_true,
           |    (SELECT count(*)::BIGINT
           |     FROM bf JOIN top$p USING (query_id, neighbor_id)) AS n_overlap
           |  FROM tot
           |)""".stripMargin
      }.mkString +
      raw"""
        |SELECT nprobe, n_queries, n_true, n_overlap,
        |  CAST(n_overlap * 1000000 // n_true AS BIGINT) AS recall_ppm
        |FROM (SELECT * FROM row1 UNION ALL SELECT * FROM row2
        |      UNION ALL SELECT * FROM row4 UNION ALL SELECT * FROM row8)
        |ORDER BY nprobe""".stripMargin),

    // Cell-population / distortion audit over the SAME trained index.
    "ann_cell_balance" -> (kmeansFin +
      raw"""SELECT cell_id, count(*)::BIGINT AS n_vectors,
        |  CAST(count(*) * 1000000 // sum(count(*)) OVER () AS BIGINT)
        |    AS share_ppm,
        |  CAST(sum(dist) AS BIGINT) AS sum_dist,
        |  max(dist)::BIGINT AS max_dist
        |FROM fin GROUP BY 1 ORDER BY cell_id""".stripMargin),

    // ann_index_update: kmeans trains on the BASE slice only (seeds +
    // 4 of 5 remaining ids), the held-out batch assigns to the frozen
    // final centroids (c1), and the census full-outer-joins both sides.
    "ann_index_update" -> (quantized +
      raw""", vb AS (
        |  SELECT * FROM v WHERE vec_id < $nccSql OR vec_id % 5 != 4
        |), vn AS (
        |  SELECT * FROM v WHERE vec_id >= $nccSql AND vec_id % 5 = 4
        |), c0 AS (
        |  SELECT vec_id AS cell_id, i, q AS c FROM vb WHERE vec_id < $nccSql
        |), d1 AS (
        |  SELECT vb.vec_id, c.cell_id,
        |    CAST(sum((vb.q - c.c) * (vb.q - c.c)) AS BIGINT) AS dist
        |  FROM vb JOIN c0 c ON vb.i = c.i
        |  WHERE vb.vec_id % $tmSql = 0 GROUP BY 1, 2
        |), a1 AS (
        |  SELECT vec_id, cell_id FROM (
        |    SELECT vec_id, cell_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell_id) AS rn
        |    FROM d1) WHERE rn = 1
        |), c1 AS (
        |  SELECT a1.cell_id, vb.i,
        |    CAST(floor(sum(vb.q)::DOUBLE / count(*)) AS BIGINT) AS c
        |  FROM a1 JOIN vb ON vb.vec_id = a1.vec_id GROUP BY 1, 2
        |), d2 AS (
        |  SELECT vb.vec_id, c.cell_id,
        |    CAST(sum((vb.q - c.c) * (vb.q - c.c)) AS BIGINT) AS dist
        |  FROM vb JOIN c1 c ON vb.i = c.i GROUP BY 1, 2
        |), a2 AS (
        |  SELECT vec_id, cell_id, dist FROM (
        |    SELECT vec_id, cell_id, dist,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell_id) AS rn
        |    FROM d2) WHERE rn = 1
        |), nd AS (
        |  SELECT vn.vec_id, c.cell_id,
        |    CAST(sum((vn.q - c.c) * (vn.q - c.c)) AS BIGINT) AS dist
        |  FROM vn JOIN c1 c ON vn.i = c.i GROUP BY 1, 2
        |), na AS (
        |  SELECT vec_id, cell_id, dist FROM (
        |    SELECT vec_id, cell_id, dist,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell_id) AS rn
        |    FROM nd) WHERE rn = 1
        |), bc AS (
        |  SELECT cell_id, count(*)::BIGINT AS n_base,
        |    max(dist) AS max_base_dist FROM a2 GROUP BY 1
        |), nc AS (
        |  SELECT cell_id, count(*)::BIGINT AS n_new,
        |    max(dist) AS max_new_dist FROM na GROUP BY 1
        |)
        |SELECT coalesce(bc.cell_id, nc.cell_id) AS cell_id,
        |  coalesce(n_base, 0)::BIGINT AS n_base,
        |  coalesce(n_new, 0)::BIGINT AS n_new,
        |  coalesce(max_base_dist, 0)::BIGINT AS max_base_dist,
        |  coalesce(max_new_dist, 0)::BIGINT AS max_new_dist,
        |  CAST(coalesce(n_new, 0) * 1000000
        |       // greatest(coalesce(n_base, 0), 1) AS BIGINT) AS growth_ppm
        |FROM bc FULL OUTER JOIN nc ON bc.cell_id = nc.cell_id
        |ORDER BY cell_id""".stripMargin),

    // ann_ivf_trained: the ann_kmeans training chain (c0→d1→a1→c1→d2)
    // extended with L2-ranked probes and inner-product candidate ranking.
    "ann_ivf_trained" -> (quantized +
      raw""", c0 AS (
        |  SELECT vec_id AS cell_id, i, q AS c FROM v WHERE vec_id < $nccSql
        |), d1 AS (
        |  SELECT v.vec_id, c.cell_id,
        |    CAST(sum((v.q - c.c) * (v.q - c.c)) AS BIGINT) AS dist
        |  FROM v JOIN c0 c ON v.i = c.i
        |  WHERE v.vec_id % $tmSql = 0 GROUP BY 1, 2
        |), a1 AS (
        |  SELECT vec_id, cell_id FROM (
        |    SELECT vec_id, cell_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell_id) AS rn
        |    FROM d1) WHERE rn = 1
        |), c1 AS (
        |  SELECT a1.cell_id, v.i,
        |    CAST(floor(sum(v.q)::DOUBLE / count(*)) AS BIGINT) AS c
        |  FROM a1 JOIN v ON v.vec_id = a1.vec_id GROUP BY 1, 2
        |), d2 AS (
        |  SELECT v.vec_id, c.cell_id,
        |    CAST(sum((v.q - c.c) * (v.q - c.c)) AS BIGINT) AS dist
        |  FROM v JOIN c1 c ON v.i = c.i GROUP BY 1, 2
        |), a2 AS (
        |  SELECT vec_id, cell_id FROM (
        |    SELECT vec_id, cell_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell_id) AS rn
        |    FROM d2) WHERE rn = 1
        |), probes AS (
        |  SELECT vec_id AS query_id, cell_id FROM (
        |    SELECT vec_id, cell_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell_id) AS crank
        |    FROM d2 WHERE vec_id % $qmSql = 0) WHERE crank <= 4
        |), cand AS (
        |  SELECT p.query_id, a.vec_id AS neighbor_id, a.cell_id,
        |    CAST(sum(q.q * n.q) AS BIGINT) AS dot
        |  FROM probes p
        |  JOIN a2 a ON a.cell_id = p.cell_id AND a.vec_id != p.query_id
        |  JOIN v q ON q.vec_id = p.query_id
        |  JOIN v n ON n.vec_id = a.vec_id AND n.i = q.i
        |  GROUP BY 1, 2, 3
        |)
        |SELECT query_id, rank, neighbor_id, cell_id, dot FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |                               ORDER BY dot DESC, neighbor_id) AS rank
        |  FROM cand)
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin),

    "ann_quantize" -> (quantized +
      raw""", sc AS (
        |  SELECT vec_id, greatest(max(abs(q)), 1)::BIGINT AS s,
        |    sum(abs(q))::BIGINT AS mag
        |  FROM v GROUP BY vec_id
        |), e AS (
        |  SELECT v.vec_id,
        |    sum(abs(v.q - (((v.q * 127) // sc.s) * sc.s) // 127))::BIGINT AS err
        |  FROM v JOIN sc ON v.vec_id = sc.vec_id
        |  GROUP BY v.vec_id
        |)
        |SELECT sc.vec_id, sc.s,
        |  ((e.err * 1000000) // greatest(sc.mag, 1))::BIGINT AS err_ppm
        |FROM sc JOIN e ON sc.vec_id = e.vec_id
        |ORDER BY sc.vec_id""".stripMargin),

    // Per-dimension quantized census (quantizer calibration). DuckDB //
    // truncates toward zero like Spark div, so mean_q is exact even for
    // negative sums.
    "ann_dim_stats" -> (quantized +
      raw"""SELECT i - 1 AS dim, count(*)::BIGINT AS n_vecs,
        |  min(q)::BIGINT AS min_q, max(q)::BIGINT AS max_q,
        |  sum(q)::BIGINT AS sum_q,
        |  CAST(sum(CASE WHEN q = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |  (sum(q) // count(*))::BIGINT AS mean_q
        |FROM v GROUP BY 1 ORDER BY dim""".stripMargin),

    "ann_label_centroids" -> (quantized +
      raw""", cent AS (
        |  SELECT label, i,
        |    CAST(floor(sum(q) * 1000.0 / count(*)) AS BIGINT) AS c
        |  FROM v GROUP BY label, i
        |)
        |SELECT a.label AS label_a, b.label AS label_b,
        |  CAST(sum(a.c * b.c) AS BIGINT) AS dot
        |FROM cent a JOIN cent b ON a.i = b.i AND a.label < b.label
        |GROUP BY 1, 2 ORDER BY label_a, label_b""".stripMargin),

    // ann_ivf IS exactly oracle-able despite being "approximate" ANN: the
    // whole pipeline (centroid pick, assignment argmax, probe ranking,
    // candidate ranking) is deterministic integer math with explicit
    // tie-breaks, so DuckDB reproduces it bit-for-bit.
    "ann_ivf" -> (quantized +
      raw""", cent AS (
        |  SELECT vec_id AS cell_id, i, q AS cq FROM v WHERE vec_id < $nccSql
        |), adot AS (
        |  SELECT v.vec_id, c.cell_id, CAST(sum(v.q * c.cq) AS BIGINT) AS d
        |  FROM v JOIN cent c ON v.i = c.i
        |  GROUP BY 1, 2
        |), assigned AS (
        |  SELECT vec_id, cell_id FROM (
        |    SELECT vec_id, cell_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell_id) AS rn
        |    FROM adot) WHERE rn = 1
        |), probes AS (
        |  SELECT vec_id AS query_id, cell_id FROM (
        |    SELECT vec_id, cell_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell_id) AS crank
        |    FROM adot WHERE vec_id % $qmSql = 0) WHERE crank <= 4
        |), cand AS (
        |  SELECT p.query_id, a.vec_id AS neighbor_id, a.cell_id,
        |    CAST(sum(q.q * n.q) AS BIGINT) AS dot
        |  FROM probes p
        |  JOIN assigned a ON a.cell_id = p.cell_id AND a.vec_id != p.query_id
        |  JOIN v q ON q.vec_id = p.query_id
        |  JOIN v n ON n.vec_id = a.vec_id AND n.i = q.i
        |  GROUP BY 1, 2, 3
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |                               ORDER BY dot DESC, neighbor_id) AS rank
        |  FROM cand
        |)
        |SELECT query_id, rank, neighbor_id, cell_id, dot FROM r
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin),

    // PQ: the subspace k-means replay is the ann_kmeans chain with (m, j)
    // = ((i-1)//8, (i-1)%8) extending every group key; cb1 is the
    // codebook after the single recompute (iters=2 assigns against it).
    "ann_pq_codes" -> (quantized + pqChain +
      raw"""SELECT vec_id, m::BIGINT AS m, code::BIGINT AS code
        |FROM a2 ORDER BY vec_id, m""".stripMargin),

    // PQ codebook staleness: trained on even ids only (initial centroids
    // = first 16 even ids), frozen, then distortion per (half, subspace).
    "ann_pq_drift" -> (quantized +
      raw""", sv AS (
        |  SELECT vec_id, (i - 1) // 8 AS m, (i - 1) % 8 AS j, q FROM v
        |), tr AS (
        |  SELECT * FROM sv WHERE vec_id % 2 = 0
        |), tb0 AS (
        |  SELECT vec_id AS code, m, j, q AS c FROM tr WHERE vec_id < 32
        |), td1 AS (
        |  SELECT tr.vec_id, tr.m, tb0.code,
        |    CAST(sum((tr.q - tb0.c) * (tr.q - tb0.c)) AS BIGINT) AS dist
        |  FROM tr JOIN tb0 ON tr.m = tb0.m AND tr.j = tb0.j
        |  GROUP BY 1, 2, 3
        |), ta1 AS (
        |  SELECT vec_id, m, code FROM (
        |    SELECT vec_id, m, code,
        |      row_number() OVER (PARTITION BY vec_id, m
        |                         ORDER BY dist, code) AS rn
        |    FROM td1) WHERE rn = 1
        |), tb1 AS (
        |  SELECT ta1.m, ta1.code, tr.j,
        |    CAST(floor(sum(tr.q)::DOUBLE / count(*)) AS BIGINT) AS c
        |  FROM ta1 JOIN tr ON tr.vec_id = ta1.vec_id AND tr.m = ta1.m
        |  GROUP BY 1, 2, 3
        |), td2 AS (
        |  SELECT sv.vec_id, sv.m, tb1.code,
        |    CAST(sum((sv.q - tb1.c) * (sv.q - tb1.c)) AS BIGINT) AS dist
        |  FROM sv JOIN tb1 ON sv.m = tb1.m AND sv.j = tb1.j
        |  GROUP BY 1, 2, 3
        |), tfin AS (
        |  SELECT vec_id, m, min(dist) AS dist FROM td2 GROUP BY 1, 2
        |)
        |SELECT (vec_id % 2)::BIGINT AS half, m::BIGINT AS m,
        |  count(*)::BIGINT AS n_vectors, sum(dist)::BIGINT AS sum_dist,
        |  CAST(sum(dist) * 1000 // count(*) AS BIGINT) AS mean_dist_milli
        |FROM tfin GROUP BY 1, 2 ORDER BY half, m""".stripMargin),

    "ann_pq_search" -> (quantized + pqChain +
      raw""", qs AS (
        |  SELECT vec_id AS query_id, m, j, q FROM sv WHERE vec_id % $qmSql = 0
        |), lut AS (
        |  SELECT qs.query_id, cb1.m, cb1.code,
        |    CAST(sum(qs.q * cb1.c) AS BIGINT) AS d
        |  FROM qs JOIN cb1 ON qs.m = cb1.m AND qs.j = cb1.j
        |  GROUP BY 1, 2, 3
        |), sc AS (
        |  SELECT l.query_id, a2.vec_id AS neighbor_id,
        |    CAST(sum(l.d) AS BIGINT) AS adc_dot
        |  FROM a2 JOIN lut l ON l.m = a2.m AND l.code = a2.code
        |    AND a2.vec_id != l.query_id
        |  GROUP BY 1, 2
        |)
        |SELECT query_id, rank, neighbor_id, adc_dot FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY adc_dot DESC, neighbor_id)::INT AS rank
        |  FROM sc)
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin),

    // IVF-PQ composed search: the kmeans chain (k-prefixed to keep its
    // CTE names disjoint from pqChain's) prunes candidates to the probed
    // cells; ADC ranks only those; exact re-rank on the shortlist.
    "ann_ivfpq_search" -> (quantized + pqChain + ivfPqChain +
      raw"""SELECT query_id, rank, neighbor_id, dot, adc_dot FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY dot DESC, neighbor_id)::INT AS rank
        |  FROM ex)
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin),

    // Recall@10 of the composed index vs the exact baseline (same
    // comparison tail as ann_pq_recall).
    "ann_ivfpq_recall" -> (quantized + pqChain + ivfPqChain +
      raw""", ivfpq10 AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY dot DESC, neighbor_id) AS rnk
        |    FROM ex) WHERE rnk <= 10
        |), bd AS (
        |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
        |    CAST(sum(q.q * v.q) AS BIGINT) AS dot
        |  FROM v q JOIN v ON q.i = v.i AND q.vec_id % $qmSql = 0
        |                 AND v.vec_id != q.vec_id
        |  GROUP BY 1, 2
        |), brute AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY dot DESC, neighbor_id) AS rnk
        |    FROM bd) WHERE rnk <= 10
        |), ov AS (
        |  SELECT query_id, count(*)::BIGINT AS n_overlap
        |  FROM brute JOIN ivfpq10 USING (query_id, neighbor_id)
        |  GROUP BY query_id
        |), tru AS (
        |  SELECT query_id, count(*)::BIGINT AS n_true FROM brute GROUP BY query_id
        |)
        |SELECT t.query_id, coalesce(o.n_overlap, 0)::BIGINT AS n_overlap,
        |  t.n_true,
        |  (coalesce(o.n_overlap, 0) * 1000000 // t.n_true)::BIGINT AS recall_ppm
        |FROM tru t LEFT JOIN ov o USING (query_id)
        |ORDER BY t.query_id""".stripMargin),

    "ann_pq_rerank" -> (quantized + pqChain +
      raw""", qs AS (
        |  SELECT vec_id AS query_id, m, j, q FROM sv WHERE vec_id % $qmSql = 0
        |), lut AS (
        |  SELECT qs.query_id, cb1.m, cb1.code,
        |    CAST(sum(qs.q * cb1.c) AS BIGINT) AS d
        |  FROM qs JOIN cb1 ON qs.m = cb1.m AND qs.j = cb1.j
        |  GROUP BY 1, 2, 3
        |), sc AS (
        |  SELECT l.query_id, a2.vec_id AS neighbor_id,
        |    CAST(sum(l.d) AS BIGINT) AS adc_dot
        |  FROM a2 JOIN lut l ON l.m = a2.m AND l.code = a2.code
        |    AND a2.vec_id != l.query_id
        |  GROUP BY 1, 2
        |), short AS (
        |  SELECT query_id, neighbor_id, adc_dot FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY adc_dot DESC, neighbor_id) AS srank
        |    FROM sc) WHERE srank <= 30
        |), ex AS (
        |  SELECT s.query_id, s.neighbor_id, s.adc_dot,
        |    CAST(sum(q.q * n.q) AS BIGINT) AS dot
        |  FROM short s
        |  JOIN v q ON q.vec_id = s.query_id
        |  JOIN v n ON n.vec_id = s.neighbor_id AND n.i = q.i
        |  GROUP BY 1, 2, 3
        |)
        |SELECT query_id, rank, neighbor_id, dot, adc_dot FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY dot DESC, neighbor_id)::INT AS rank
        |  FROM ex)
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin),

    "ann_srp_topk" -> (quantized +
      raw""", c AS (
        |  SELECT p, i,
        |    CASE WHEN ('0x' || substring(md5(p || '_' || i), 1, 1))::INT % 2 = 1
        |         THEN 1 ELSE -1 END AS cc
        |  FROM range(0, 60) r(p), range(1, 65) s(i)
        |  WHERE p < 4 * $srpBitsSql
        |), sigv AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END)
        |         AS BIGINT) AS sg
        |  FROM (SELECT vec_id, p, sum(q * cc) AS proj
        |        FROM v JOIN c ON v.i = c.i GROUP BY 1, 2)
        |  GROUP BY vec_id
        |), bands AS (
        |  SELECT vec_id, band,
        |    (sg >> (band * $srpBitsSql)) & ((1::BIGINT << $srpBitsSql) - 1) AS bv
        |  FROM sigv, range(0, 4) r(band)
        |), cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
        |  FROM bands q JOIN bands n ON q.band = n.band AND q.bv = n.bv
        |  WHERE q.vec_id % $qmSql = 0 AND n.vec_id != q.vec_id
        |), dots AS (
        |  SELECT query_id, neighbor_id, CAST(sum(a.q * b.q) AS BIGINT) AS dot
        |  FROM cand
        |  JOIN v a ON a.vec_id = query_id
        |  JOIN v b ON b.vec_id = neighbor_id AND b.i = a.i
        |  GROUP BY 1, 2
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |                               ORDER BY dot DESC, neighbor_id) AS rank
        |  FROM dots
        |)
        |SELECT query_id, rank, neighbor_id, dot FROM r
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin),

    "ann_srp_recall" -> (quantized +
      raw""", d AS (
        |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
        |    CAST(sum(q.q * v.q) AS BIGINT) AS dot
        |  FROM v q JOIN v ON q.i = v.i AND q.vec_id % $qmSql = 0
        |                 AND v.vec_id != q.vec_id
        |  GROUP BY 1, 2
        |), br AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY dot DESC, neighbor_id) AS rnk
        |  FROM d
        |), brute AS (
        |  SELECT query_id, neighbor_id FROM br WHERE rnk <= 10
        |), c AS (
        |  SELECT p, i,
        |    CASE WHEN ('0x' || substring(md5(p || '_' || i), 1, 1))::INT % 2 = 1
        |         THEN 1 ELSE -1 END AS cc
        |  FROM range(0, 60) r(p), range(1, 65) s(i)
        |  WHERE p < 4 * $srpBitsSql
        |), sigv AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END)
        |         AS BIGINT) AS sg
        |  FROM (SELECT vec_id, p, sum(q * cc) AS proj
        |        FROM v JOIN c ON v.i = c.i GROUP BY 1, 2)
        |  GROUP BY vec_id
        |), bands AS (
        |  SELECT vec_id, band,
        |    (sg >> (band * $srpBitsSql)) & ((1::BIGINT << $srpBitsSql) - 1) AS bv
        |  FROM sigv, range(0, 4) r(band)
        |), cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
        |  FROM bands q JOIN bands n ON q.band = n.band AND q.bv = n.bv
        |  WHERE q.vec_id % $qmSql = 0 AND n.vec_id != q.vec_id
        |), sdots AS (
        |  SELECT query_id, neighbor_id, CAST(sum(a.q * b.q) AS BIGINT) AS dot
        |  FROM cand
        |  JOIN v a ON a.vec_id = query_id
        |  JOIN v b ON b.vec_id = neighbor_id AND b.i = a.i
        |  GROUP BY 1, 2
        |), sr AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |                               ORDER BY dot DESC, neighbor_id) AS rnk
        |  FROM sdots
        |), srp AS (
        |  SELECT query_id, neighbor_id FROM sr WHERE rnk <= 10
        |), ov AS (
        |  SELECT query_id, count(*)::BIGINT AS n_overlap
        |  FROM brute JOIN srp USING (query_id, neighbor_id) GROUP BY query_id
        |), tru AS (
        |  SELECT query_id, count(*)::BIGINT AS n_true FROM brute GROUP BY query_id
        |)
        |SELECT t.query_id, coalesce(o.n_overlap, 0)::BIGINT AS n_overlap,
        |  t.n_true,
        |  (coalesce(o.n_overlap, 0) * 1000000 // t.n_true)::BIGINT AS recall_ppm
        |FROM tru t LEFT JOIN ov o USING (query_id)
        |ORDER BY t.query_id""".stripMargin),

    "ann_pq_recall" -> (quantized + pqChain +
      raw""", qs AS (
        |  SELECT vec_id AS query_id, m, j, q FROM sv WHERE vec_id % $qmSql = 0
        |), lut AS (
        |  SELECT qs.query_id, cb1.m, cb1.code,
        |    CAST(sum(qs.q * cb1.c) AS BIGINT) AS d
        |  FROM qs JOIN cb1 ON qs.m = cb1.m AND qs.j = cb1.j
        |  GROUP BY 1, 2, 3
        |), sc AS (
        |  SELECT l.query_id, a2.vec_id AS neighbor_id,
        |    CAST(sum(l.d) AS BIGINT) AS adc_dot
        |  FROM a2 JOIN lut l ON l.m = a2.m AND l.code = a2.code
        |    AND a2.vec_id != l.query_id
        |  GROUP BY 1, 2
        |), short AS (
        |  SELECT query_id, neighbor_id, adc_dot FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY adc_dot DESC, neighbor_id) AS srank
        |    FROM sc) WHERE srank <= 30
        |), exd AS (
        |  SELECT s.query_id, s.neighbor_id,
        |    CAST(sum(q.q * n.q) AS BIGINT) AS dot
        |  FROM short s
        |  JOIN v q ON q.vec_id = s.query_id
        |  JOIN v n ON n.vec_id = s.neighbor_id AND n.i = q.i
        |  GROUP BY 1, 2
        |), pq10 AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY dot DESC, neighbor_id) AS rnk
        |    FROM exd) WHERE rnk <= 10
        |), bd AS (
        |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
        |    CAST(sum(q.q * v.q) AS BIGINT) AS dot
        |  FROM v q JOIN v ON q.i = v.i AND q.vec_id % $qmSql = 0
        |                 AND v.vec_id != q.vec_id
        |  GROUP BY 1, 2
        |), brute AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY dot DESC, neighbor_id) AS rnk
        |    FROM bd) WHERE rnk <= 10
        |), ov AS (
        |  SELECT query_id, count(*)::BIGINT AS n_overlap
        |  FROM brute JOIN pq10 USING (query_id, neighbor_id) GROUP BY query_id
        |), tru AS (
        |  SELECT query_id, count(*)::BIGINT AS n_true FROM brute GROUP BY query_id
        |)
        |SELECT t.query_id, coalesce(o.n_overlap, 0)::BIGINT AS n_overlap,
        |  t.n_true,
        |  (coalesce(o.n_overlap, 0) * 1000000 // t.n_true)::BIGINT AS recall_ppm
        |FROM tru t LEFT JOIN ov o USING (query_id)
        |ORDER BY t.query_id""".stripMargin),

    "corpus_cell_quality" -> (quantized +
      raw""", cent AS (
        |  SELECT vec_id AS cell_id, i, q AS cq FROM v WHERE vec_id < $nccSql
        |), adot AS (
        |  SELECT v.vec_id, c.cell_id, CAST(sum(v.q * c.cq) AS BIGINT) AS d
        |  FROM v JOIN cent c ON v.i = c.i
        |  GROUP BY 1, 2
        |), assigned AS (
        |  SELECT vec_id, cell_id FROM (
        |    SELECT vec_id, cell_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell_id) AS rn
        |    FROM adot) WHERE rn = 1
        |), """.stripMargin + docQuality + raw""", verdict AS (
        |  SELECT doc_id, keep FROM dq
        |)
        |SELECT cell_id, count(*)::BIGINT AS n_docs,
        |  sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_keep,
        |  (sum(CASE WHEN keep THEN 1 ELSE 0 END) * 1000000
        |    // count(*))::BIGINT AS keep_ppm
        |FROM assigned JOIN verdict ON vec_id = doc_id
        |GROUP BY cell_id ORDER BY cell_id""".stripMargin),

    "ann_range_search" -> (quantized +
      raw""", cent AS (
        |  SELECT vec_id AS cell_id, i, q AS cq FROM v WHERE vec_id < $nccSql
        |), adot AS (
        |  SELECT v.vec_id, c.cell_id, CAST(sum(v.q * c.cq) AS BIGINT) AS d
        |  FROM v JOIN cent c ON v.i = c.i
        |  GROUP BY 1, 2
        |), assigned AS (
        |  SELECT vec_id, cell_id FROM (
        |    SELECT vec_id, cell_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell_id) AS rn
        |    FROM adot) WHERE rn = 1
        |), probes AS (
        |  SELECT vec_id AS query_id, cell_id FROM (
        |    SELECT vec_id, cell_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell_id) AS crank
        |    FROM adot WHERE vec_id % $qmSql = 0) WHERE crank <= 4
        |)
        |SELECT p.query_id, a.vec_id AS neighbor_id, a.cell_id,
        |  CAST(sum(q.q * n.q) AS BIGINT) AS dot
        |FROM probes p
        |JOIN assigned a ON a.cell_id = p.cell_id AND a.vec_id != p.query_id
        |JOIN v q ON q.vec_id = p.query_id
        |JOIN v n ON n.vec_id = a.vec_id AND n.i = q.i
        |GROUP BY 1, 2, 3
        |HAVING CAST(sum(q.q * n.q) AS BIGINT) >= 250000
        |ORDER BY query_id, neighbor_id""".stripMargin),

    // Label-filtered top-k on the TRAINED index: the kmeansFin chain
    // replays the same two Lloyd iterations the engine serves, then the
    // probe/rank replay adds the label equality as a pre-filter join.
    "ann_filtered_search" -> (kmeansFin +
      raw""", lab AS (
        |  SELECT vec_id, label FROM embeddings
        |), pr AS (
        |  SELECT vec_id AS query_id, cell_id FROM (
        |    SELECT vec_id, cell_id,
        |      row_number() OVER (PARTITION BY vec_id
        |                         ORDER BY dist, cell_id) AS crank
        |    FROM d2 WHERE vec_id % $qmSql = 0) WHERE crank <= 4
        |), cand AS (
        |  SELECT p.query_id, ql.label, a.vec_id AS neighbor_id,
        |    CAST(sum(q.q * n.q) AS BIGINT) AS dot
        |  FROM pr p
        |  JOIN fin a ON a.cell_id = p.cell_id AND a.vec_id != p.query_id
        |  JOIN lab ql ON ql.vec_id = p.query_id
        |  JOIN lab nl ON nl.vec_id = a.vec_id AND nl.label = ql.label
        |  JOIN v q ON q.vec_id = p.query_id
        |  JOIN v n ON n.vec_id = a.vec_id AND n.i = q.i
        |  GROUP BY 1, 2, 3
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |                               ORDER BY dot DESC, neighbor_id) AS rank
        |  FROM cand
        |)
        |SELECT query_id, label, rank, neighbor_id, dot FROM r
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin),

  )
}
