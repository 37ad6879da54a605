package graft

/** Shared DuckDB-oracle prelude chains (named WITH-clause prefixes) and
  * oracle helper builders — one definition each, consumed by the family
  * oracle modules (split from ExtQueries in round 10).
  */
private[graft] object OraclePreludes {
  private[graft] val eventsE =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS tsu,
      |    epoch_us(ts) // 86400000000 AS day,
      |    CAST(floor("value" * 100) AS BIGINT) AS value_c
      |  FROM events
      |)""".stripMargin

  /** Quality-gate census `dq` — ONE definition of the corpus keep
    * predicate's inputs and the keep bit itself (lateral alias refs are
    * DuckDB-native): (doc_id, lang, source, text, n_tokens, punct_ppm,
    * terminal, keep). Six oracles formerly restated this projection. */
  private[graft] val docQuality =
    """dq AS (
      |  SELECT doc_id, lang, source, text,
      |    len(list_filter(string_split_regex(text, '\s+'),
      |                    x -> x != ''))::BIGINT AS n_tokens,
      |    (len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) * 1000000
      |      // greatest(length(text), 1))::BIGINT AS punct_ppm,
      |    regexp_matches(rtrim(text), '[.!?。！？]$') AS terminal,
      |    (n_tokens >= 5 AND punct_ppm <= 300000 AND terminal) AS keep
      |  FROM documents
      |)""".stripMargin

  private[graft] val toks =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |                             x -> x != '') AS t
      |  FROM documents
      |)""".stripMargin

  private[graft] val shingles3 = toks +
    """, sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(t) >= 3 THEN
      |      list_distinct(list_transform(range(1, len(t) - 1),
      |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
      |    ELSE [] END AS sh
      |  FROM toks
      |)""".stripMargin

  /** Derived shingle df cap 8 · ⌈log2 n_documents⌉ (r15,
    * [[graft.engine.ext.ScaleKnobs.shingleDfCap]]): shingles above the
    * cap are excluded from shared-shingle candidate blocking on both
    * sides — boilerplate phrases carry no near-dup signal and their
    * C(df, 2) expansions are the pipelines' only quadratic term.
    * (Defined BEFORE spanChain: object vals initialize in declaration
    * order and spanChain splices this in.)
    */
  private[graft] val shingleCapCte =
    """sdc AS (
      |  SELECT 8 * greatest(1,
      |    (SELECT min(b) FROM range(0, 63) t(b)
      |     WHERE (1::BIGINT << b) >= (SELECT count(*) FROM documents)))::BIGINT
      |    AS cap
      |)""".stripMargin
  private[graft] val shingleCapSql = "(SELECT cap FROM sdc)"

  /** Positional-shingle shared-span chain (dedup_substring /
    * dedup_span_coverage): `spans` = maximal diagonal runs ≥ 10 tokens
    * with both start positions, BIGINT throughout.
    */
  private[graft] val spanChain = toks + ", " + shingleCapCte +
    """, pos AS (
      |  SELECT doc_id, t, unnest(range(0, len(t) - 2)) AS p
      |  FROM toks WHERE len(t) >= 3
      |), psh AS (
      |  SELECT doc_id, p,
      |    ('0x' || substring(md5(t[p+1] || ' ' || t[p+2] || ' ' || t[p+3]),
      |             1, 15))::BIGINT AS fp
      |  FROM pos
      |), bkt AS (
      |  SELECT doc_id, p, fp, count(*) OVER (PARTITION BY fp) AS df
      |  FROM psh
      |), prs AS (
      |  SELECT x.doc_id AS doc_a, x.p AS pa, y.doc_id AS doc_b, y.p AS pb
      |  FROM bkt x JOIN bkt y ON x.fp = y.fp AND x.doc_id < y.doc_id
      |  WHERE x.df <= (SELECT cap FROM sdc)
      |), risl AS (
      |  SELECT doc_a, doc_b, pa - pb AS diag, pa,
      |    pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb
      |                            ORDER BY pa) AS grp
      |  FROM prs
      |), rsp AS (
      |  SELECT doc_a, doc_b, diag, grp, count(*) AS cnt, min(pa) AS a_start
      |  FROM risl GROUP BY 1, 2, 3, 4
      |), spans AS (
      |  SELECT doc_a, doc_b, a_start::BIGINT AS a_start,
      |    (a_start - diag)::BIGINT AS b_start,
      |    (cnt + 2)::BIGINT AS span_tokens
      |  FROM rsp WHERE cnt + 2 >= 10
      |)""".stripMargin

  private[graft] val tokHash =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                                    x -> x != '')) AS tok
      |  FROM documents
      |), h AS (
      |  SELECT doc_id, ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h FROM tok
      |)""".stripMargin

  private[graft] val simhashSig = tokHash +
    """, vote AS (
      |  SELECT doc_id, bit,
      |    sum(CASE WHEN (h >> bit) % 2 = 1 THEN 1 ELSE -1 END) AS vote
      |  FROM h, range(0, 60) r(bit) GROUP BY 1, 2
      |), sig AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN vote > 0 THEN (1::BIGINT << bit) ELSE 0 END)
      |         AS BIGINT) AS simhash
      |  FROM vote GROUP BY doc_id
      |)""".stripMargin

  /** SimHash connected-components chain (shared by dedup_clusters /
    * dedup_canonical / corpus_dedup_weights): appended after
    * [[simhashSig]] under a WITH RECURSIVE header; yields `cl` =
    * (doc_id, cluster_id = min member id).
    */
  private[graft] val simhashCcChain =
    """, bands AS (
      |  SELECT doc_id, simhash, band,
      |    (simhash >> (band * 15)) & 32767 AS band_val
      |  FROM sig, range(0, 4) r(band)
      |), edges AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
      |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
      |), edges2 AS MATERIALIZED (
      |  -- MATERIALIZED: the recursion below otherwise re-inlines the whole
      |  -- SimHash chain (tokenize → vote → sig → band join) into EVERY
      |  -- iteration — hours of CPU at sf1 vs seconds with the hint. Purely
      |  -- an evaluation hint; results are identical (tri-scale replayed).
      |  SELECT doc_a, doc_b FROM edges
      |  UNION ALL
      |  SELECT doc_b, doc_a FROM edges
      |), rr(v, m) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.doc_b, rr.m FROM rr JOIN edges2 e ON e.doc_a = rr.v
      |), cl AS (
      |  SELECT v AS doc_id, min(m) AS cluster_id FROM rr GROUP BY v
      |)""".stripMargin

  /** Corpus-derived Hamming-signature geometry (r13) — the exact integer
    * rules of [[graft.engine.ext.ScaleKnobs.sigBitsPerBand]] /
    * [[graft.engine.ext.ScaleKnobs.sigMaxHamming]], replayed from the
    * oracle's own count(*): band width min(30, max(15, ⌈log2 n⌉ − 1))
    * (occupancy ≤ 2 past the 15-bit floor) and the fraction-preserving
    * match threshold (8·4·bits) // 60 (exactly 8 at 4 × 15).
    */
  private[graft] val sigBitsCte =
    """sbc AS (
      |  SELECT least(30, greatest(15,
      |    (SELECT min(b) FROM range(0, 63) t(b)
      |     WHERE (1::BIGINT << b) >= (SELECT count(*) FROM documents))
      |    - 1))::BIGINT AS bits
      |)""".stripMargin
  private[graft] val sigBitsSql = "(SELECT bits FROM sbc)"
  private[graft] val sigMaxHamSql = s"((8 * 4 * $sigBitsSql) // 60)"

  /** Corpus-derived Hamming band-bucket family cap (r14) — the exact
    * integer rule of [[graft.engine.ext.ScaleKnobs.hammingBucketCap]]:
    * 64 · ⌈log2 n⌉ (floor 64), replayed from the oracle's own count(*).
    * Band buckets past the cap are real duplicate families and are
    * excluded from pair generation on both sides.
    */
  private[graft] val bucketCapCte =
    """hbc AS (
      |  SELECT 64 * greatest(1,
      |    (SELECT min(b) FROM range(0, 63) t(b)
      |     WHERE (1::BIGINT << b) >= (SELECT count(*) FROM documents)))::BIGINT
      |    AS cap
      |)""".stripMargin
  private[graft] val bucketCapSql = "(SELECT cap FROM hbc)"

  /** SimHash near-dup PAIR chain at the CORPUS-DERIVED geometry — the
    * replay of [[graft.engine.ext.Dedup.simhashPairs]]'s r13 default:
    * two 60-bit md5 halves per token (120 hash bits cover the 30-bit
    * band cap), ±1 votes per global bit, per-BAND signature values
    * `sbv` (band b holds derived-width bits b·w .. b·w+w−1 — the same
    * global-bit allocation the packed single-long form used at 4 × 15,
    * so at ≤ 65k docs this chain reproduces the historical oracle
    * bit-for-bit), band-blocked candidates, exact Hamming as the sum of
    * per-band bit_count(xor). Yields `pairs` = (doc_a, doc_b, hamming ≤
    * derived threshold).
    */
  private[graft] val simhashDerivedPairs =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                                    x -> x != '')) AS tok
      |  FROM documents
      |), h2 AS (
      |  SELECT doc_id,
      |    ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h0,
      |    ('0x' || substring(md5(tok), 16, 15))::BIGINT AS h1
      |  FROM tok
      |), """.stripMargin + sigBitsCte +
      """, vote AS (
        |  SELECT doc_id, bit,
        |    sum(CASE WHEN ((CASE WHEN bit < 60 THEN h0 ELSE h1 END)
        |        >> (bit % 60)::INT) % 2 = 1 THEN 1 ELSE -1 END) AS vote
        |  FROM h2, range(0, 120) r(bit)
        |  WHERE bit < 4 * (SELECT bits FROM sbc)
        |  GROUP BY 1, 2
        |), sbv AS (
        |  SELECT doc_id, (bit // (SELECT bits FROM sbc))::BIGINT AS band,
        |    CAST(sum(CASE WHEN vote > 0
        |      THEN (1::BIGINT << (bit % (SELECT bits FROM sbc))::INT)
        |      ELSE 0 END) AS BIGINT) AS band_val
        |  FROM vote GROUP BY 1, 2
        |), """.stripMargin + bucketCapCte +
      """, bok AS (
        |  -- band buckets within the derived family cap (r14): buckets
        |  -- past the cap are excluded from pair generation, replaying
        |  -- ScaleKnobs.hammingBucketCap
        |  SELECT band, band_val FROM sbv GROUP BY 1, 2
        |  HAVING count(*) BETWEEN 2 AND (SELECT cap FROM hbc)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bok k
        |  JOIN sbv a ON a.band = k.band AND a.band_val = k.band_val
        |  JOIN sbv b ON b.band = k.band AND b.band_val = k.band_val
        |    AND a.doc_id < b.doc_id
        |), prs AS (
        |  SELECT c.doc_a, c.doc_b,
        |    CAST(sum(bit_count(xor(x.band_val, y.band_val))) AS BIGINT)
        |      AS hamming
        |  FROM cand c
        |  JOIN sbv x ON x.doc_id = c.doc_a
        |  JOIN sbv y ON y.doc_id = c.doc_b AND y.band = x.band
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT doc_a, doc_b, hamming FROM prs
        |  WHERE hamming <= (8 * 4 * (SELECT bits FROM sbc)) // 60
        |)""".stripMargin

  /** Connected-components chain over the derived-geometry pair list
    * (appended after [[simhashDerivedPairs]] under a WITH RECURSIVE
    * header); yields `cl` = (doc_id, cluster_id = min member id) —
    * the derived-geometry successor of [[simhashCcChain]].
    */
  private[graft] val simhashDerivedCcChain =
    """, edges2 AS MATERIALIZED (
      |  -- MATERIALIZED: the recursion below otherwise re-inlines the whole
      |  -- SimHash chain (tokenize → vote → sig → band join) into EVERY
      |  -- iteration — hours of CPU at sf1 vs seconds with the hint. Purely
      |  -- an evaluation hint; results are identical (tri-scale replayed).
      |  SELECT doc_a, doc_b FROM pairs
      |  UNION ALL
      |  SELECT doc_b, doc_a FROM pairs
      |), rr(v, m) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.doc_b, rr.m FROM rr JOIN edges2 e ON e.doc_a = rr.v
      |), cl AS (
      |  SELECT v AS doc_id, min(m) AS cluster_id FROM rr GROUP BY v
      |)""".stripMargin

  /** Quantized-vector working set `v`, plus the two SCALE-DERIVED knob
    * CTEs every ANN/SRP oracle replays from its own count(*) (the exact
    * integer rules of [[graft.engine.ext.ScaleKnobs]]):
    * `qmc.qm`  = query-panel modulus max(50, ⌈n/100⌉) — fixed ~100-query
    *             panels, so exact baselines stay linear in the corpus;
    * `nbc.bits` = SRP band width min(15, max(4, ⌈log2 n⌉ − 7)) — bucket
    *             occupancy ≤ 128, so LSH pair work stays linear;
    * `ncc.nc`  = IVF coarse-cell count max(16, 2^⌈⌈log2 n⌉/2⌉) — the
    *             nCells ≈ √n train-time rule (r12), so centroid ranking
    *             and per-cell candidate scans both grow as √n;
    * `tmc.tm`  = k-means training-sample modulus max(1, n div (64·nc))
    *             (r15) — the Lloyd RECOMPUTE iterations argmin only
    *             `vec_id % tm = 0` vectors (≥ 64 per centroid), the
    *             final assignment covers the corpus; tm = 1 at every
    *             committed scale ≤ sf1.
    * Unreferenced CTEs cost nothing in DuckDB, so the non-panel oracles
    * sharing this prelude are unaffected.
    */
  private[graft] val quantized =
    """WITH v AS (
      |  SELECT vec_id, label, i,
      |    CAST(floor(embedding[i]::DOUBLE * 1000) AS BIGINT) AS q
      |  FROM embeddings, range(1, 65) t(i)
      |), qmc AS (
      |  SELECT greatest(50, (count(*) + 99) // 100)::BIGINT AS qm
      |  FROM embeddings
      |), nbc AS (
      |  SELECT least(15, greatest(4,
      |    (SELECT min(b) FROM range(0, 63) t(b)
      |     WHERE (1::BIGINT << b) >= (SELECT count(*) FROM embeddings))
      |    - 7))::BIGINT AS bits
      |), ncc AS (
      |  SELECT greatest(16, 1::BIGINT <<
      |    (((SELECT min(b) FROM range(0, 63) t(b)
      |       WHERE (1::BIGINT << b) >= (SELECT count(*) FROM embeddings))
      |      + 1) // 2))::BIGINT AS nc
      |), tmc AS (
      |  SELECT greatest(1, (SELECT count(*) FROM embeddings)
      |    // (64 * (SELECT nc FROM ncc)))::BIGINT AS tm
      |)""".stripMargin

  /** The panel predicate / band-width / cell-count scalars, inlined at
    * each use site. */
  private[graft] val qmSql = "(SELECT qm FROM qmc)"
  private[graft] val srpBitsSql = "(SELECT bits FROM nbc)"
  private[graft] val nccSql = "(SELECT nc FROM ncc)"
  private[graft] val tmSql = "(SELECT tm FROM tmc)"

  /** Document-side panel modulus (text/RAG retrieval panels): same
    * fixed-panel rule, derived from the documents count.
    */
  private[graft] val docQmCte =
    """dqmc AS (
      |  SELECT greatest(50, (count(*) + 99) // 100)::BIGINT AS qm
      |  FROM documents
      |)""".stripMargin
  private[graft] val docQmSql = "(SELECT qm FROM dqmc)"

  /** The ann_kmeans training replay (two Lloyd iterations, exact
    * integer / floor-mean arithmetic, explicit tie-breaks), ending in
    * `fin` = the final (vec_id, cell_id, dist) assignment — shared by
    * ann_kmeans and the ann_cell_balance audit so both read the
    * identical trained index. d1 (the recompute iteration's argmin)
    * scans only the `vec_id % tm = 0` training sample (r15,
    * ScaleKnobs.kmeansTrainMod); d2 (the final assignment) scans the
    * full corpus.
    */
  private[graft] val kmeansFin = quantized +
    s""", c0 AS (
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
      |), fin AS (
      |  SELECT vec_id, cell_id, dist FROM (
      |    SELECT vec_id, cell_id, dist,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell_id) AS rn
      |    FROM d2) WHERE rn = 1)
      |""".stripMargin

  /** SRP cosine-pair chain (shared by dedup_embed_pairs /
    * dedup_semantic_clusters): appended after [[quantized]], yields
    * `sprs` = (va, vb, dot, na, nb) pairs passing the exact 2/5 cosine
    * threshold. Ends after the closing paren of `sprs`, so callers
    * either start their SELECT directly or continue the CTE list with
    * a leading ", ". The plane count is the SCALE-DERIVED 4 · nbc.bits
    * (see [[quantized]]) — the replay of the engine's adaptive default.
    */
  /** Just the SRP signature → band rows (c, sigv, bands) — shared by
    * [[srpPairChain]] and the dedup_srp_occupancy census. */
  private[graft] val srpBandChain =
    s""", c AS (
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
      |)""".stripMargin

  private[graft] val srpPairChain = srpBandChain +
    s""", norms AS (
      |  SELECT vec_id, sum(q * q) AS n2 FROM v GROUP BY 1
      |), cand AS (
      |  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.bv = b.bv AND a.vec_id < b.vec_id
      |), dots AS (
      |  SELECT va, vb, CAST(sum(a.q * b.q) AS BIGINT) AS dot
      |  FROM cand JOIN v a ON a.vec_id = va JOIN v b ON b.vec_id = vb AND b.i = a.i
      |  GROUP BY 1, 2
      |), sprs AS (
      |  SELECT va, vb, dot, na.n2 AS na, nb.n2 AS nb
      |  FROM dots JOIN norms na ON na.vec_id = va JOIN norms nb ON nb.vec_id = vb
      |  WHERE dot > 0 AND dot * dot * 25 >= na.n2 * nb.n2 * 4
      |)
      |""".stripMargin

  /** Per-subspace PQ training chain (shared by ann_pq_codes/_search):
    * sv = subvector rows, cb0 = init codebook (first 16 vectors), one
    * assign (a1) + recompute (cb1) + final assign (a2) — the exact
    * DuckDB replay of Similarity.pqLoop(iters = 2).
    */
  private[graft] val pqChain =
    """, sv AS (
      |  SELECT vec_id, (i - 1) // 8 AS m, (i - 1) % 8 AS j, q FROM v
      |), cb0 AS (
      |  SELECT vec_id AS code, m, j, q AS c FROM sv WHERE vec_id < 16
      |), d1 AS (
      |  SELECT sv.vec_id, sv.m, cb0.code,
      |    CAST(sum((sv.q - cb0.c) * (sv.q - cb0.c)) AS BIGINT) AS dist
      |  FROM sv JOIN cb0 ON sv.m = cb0.m AND sv.j = cb0.j
      |  GROUP BY 1, 2, 3
      |), a1 AS (
      |  SELECT vec_id, m, code FROM (
      |    SELECT vec_id, m, code,
      |      row_number() OVER (PARTITION BY vec_id, m
      |                         ORDER BY dist, code) AS rn
      |    FROM d1) WHERE rn = 1
      |), cb1 AS (
      |  SELECT a1.m, a1.code, sv.j,
      |    CAST(floor(sum(sv.q)::DOUBLE / count(*)) AS BIGINT) AS c
      |  FROM a1 JOIN sv ON sv.vec_id = a1.vec_id AND sv.m = a1.m
      |  GROUP BY 1, 2, 3
      |), d2 AS (
      |  SELECT sv.vec_id, sv.m, cb1.code,
      |    CAST(sum((sv.q - cb1.c) * (sv.q - cb1.c)) AS BIGINT) AS dist
      |  FROM sv JOIN cb1 ON sv.m = cb1.m AND sv.j = cb1.j
      |  GROUP BY 1, 2, 3
      |), a2 AS (
      |  SELECT vec_id, m, code FROM (
      |    SELECT vec_id, m, code,
      |      row_number() OVER (PARTITION BY vec_id, m
      |                         ORDER BY dist, code) AS rn
      |    FROM d2) WHERE rn = 1
      |)
      |""".stripMargin

  /** IVF-PQ composed chain (appended after `quantized` + `pqChain`):
    * kmeans cell training (k-prefixed, disjoint from pqChain's CTE names)
    * → probes → cell-pruned candidates → ADC over codes → shortlist →
    * exact re-rank (`ex`). Shared by ann_ivfpq_search / ann_ivfpq_recall.
    */
  private[graft] val ivfPqChain =
    s""", kc0 AS (
      |  SELECT vec_id AS cell_id, i, q AS c FROM v WHERE vec_id < $nccSql
      |), kd1 AS (
      |  SELECT v.vec_id, c.cell_id,
      |    CAST(sum((v.q - c.c) * (v.q - c.c)) AS BIGINT) AS dist
      |  FROM v JOIN kc0 c ON v.i = c.i
      |  WHERE v.vec_id % $tmSql = 0 GROUP BY 1, 2
      |), ka1 AS (
      |  SELECT vec_id, cell_id FROM (
      |    SELECT vec_id, cell_id,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell_id) AS rn
      |    FROM kd1) WHERE rn = 1
      |), kc1 AS (
      |  SELECT ka1.cell_id, v.i,
      |    CAST(floor(sum(v.q)::DOUBLE / count(*)) AS BIGINT) AS c
      |  FROM ka1 JOIN v ON v.vec_id = ka1.vec_id GROUP BY 1, 2
      |), kd2 AS (
      |  SELECT v.vec_id, c.cell_id,
      |    CAST(sum((v.q - c.c) * (v.q - c.c)) AS BIGINT) AS dist
      |  FROM v JOIN kc1 c ON v.i = c.i GROUP BY 1, 2
      |), ka2 AS (
      |  SELECT vec_id, cell_id FROM (
      |    SELECT vec_id, cell_id,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell_id) AS rn
      |    FROM kd2) WHERE rn = 1
      |), kprobes AS (
      |  SELECT vec_id AS query_id, cell_id FROM (
      |    SELECT vec_id, cell_id,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell_id) AS crank
      |    FROM kd2 WHERE vec_id % $qmSql = 0) WHERE crank <= 4
      |), ccand AS (
      |  SELECT p.query_id, a.vec_id AS neighbor_id
      |  FROM kprobes p
      |  JOIN ka2 a ON a.cell_id = p.cell_id AND a.vec_id != p.query_id
      |), qs AS (
      |  SELECT vec_id AS query_id, m, j, q FROM sv WHERE vec_id % $qmSql = 0
      |), lut AS (
      |  SELECT qs.query_id, cb1.m, cb1.code,
      |    CAST(sum(qs.q * cb1.c) AS BIGINT) AS d
      |  FROM qs JOIN cb1 ON qs.m = cb1.m AND qs.j = cb1.j
      |  GROUP BY 1, 2, 3
      |), sc AS (
      |  SELECT c.query_id, c.neighbor_id, CAST(sum(l.d) AS BIGINT) AS adc_dot
      |  FROM ccand c
      |  JOIN a2 ON a2.vec_id = c.neighbor_id
      |  JOIN lut l ON l.query_id = c.query_id
      |    AND l.m = a2.m AND l.code = a2.code
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
      |""".stripMargin

  // One UNION ALL block of the ext_key_skew oracle: ceil-rank percentiles
  // read off the count-of-counts cumulative sum, mirroring the engine's
  // census-not-sort plan so the arithmetic (and rounding) is identical.
  private[graft] def keySkewOracle(key: String): String =
    s"""SELECT '$key' AS key_name, CAST(n_rows AS BIGINT) AS n_rows,
       |  CAST(n_keys AS BIGINT) AS n_keys, max_n,
       |  min(CASE WHEN cum >= (n_keys + 1) // 2 THEN n END)::BIGINT AS p50_n,
       |  min(CASE WHEN cum >= (n_keys * 99 + 99) // 100 THEN n END)::BIGINT
       |    AS p99_n,
       |  CAST(max_n * 1000000 // n_rows AS BIGINT) AS top_share_ppm
       |FROM (
       |  SELECT n, cnt,
       |    sum(cnt) OVER (ORDER BY n ROWS UNBOUNDED PRECEDING) AS cum,
       |    sum(cnt) OVER () AS n_keys, sum(n * cnt) OVER () AS n_rows,
       |    max(n) OVER () AS max_n
       |  FROM (SELECT n, count(*)::BIGINT AS cnt
       |        FROM (SELECT $key, count(*)::BIGINT AS n
       |              FROM lineitem GROUP BY 1)
       |        GROUP BY 1))
       |GROUP BY n_rows, n_keys, max_n""".stripMargin

  // BYTE semantics throughout, to match the engine exactly: the payload is
  // text.cast(binary) = UTF-8 bytes, so the oracle measures octet_length and
  // indexes bytes via a hex-string slice ('0x' || 2 hex chars → INT), never
  // character positions — char and byte indexing diverge on any non-ASCII
  // document and the documents schema is explicitly multilingual.
  // Empty payloads read as byte 0 (engine: FakeCodec returns 0 on empty).
  private[graft] val media =
    """WITH m AS (
      |  SELECT doc_id,
      |    ['jpeg','png','wav','mp4'][(doc_id % 4 + 1)::INT] AS format,
      |    CAST(64 + n_chars % 512 AS INT) AS width,
      |    CAST(64 + (doc_id * 37) % 512 AS INT) AS height,
      |    CAST(1 + doc_id % 8 AS INT) AS n_frames,
      |    octet_length(encode(text)) AS n_bytes,
      |    coalesce(try_cast('0x' || substring(hex(encode(text)), 1, 2) AS INT), 0)
      |      AS first_byte,
      |    hex(encode(text)) AS hx
      |  FROM documents
      |), fr AS (
      |  SELECT doc_id,
      |    CAST(sum(coalesce(try_cast('0x' || substring(hx,
      |      greatest(least((f * n_bytes) // n_frames, n_bytes - 1), 0) * 2 + 1,
      |      2) AS INT), 0)) AS BIGINT) AS frame_byte_sum
      |  FROM m, range(0, 8) t(f) WHERE f < n_frames GROUP BY doc_id
      |)""".stripMargin

}
