package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.ext._

/** Extension-operator registrations (relational, sessionization, text
  * analysis, dedup, similarity, multimodal) with their DuckDB oracles.
  * Merged into [[SparkEntry.queries]] / [[SparkEntry.oracleSql]].
  *
  * Oracle-parity ground rules (see SURVEY.md §7.2):
  *  - similarity/ratio outputs are integer (ppm / quantized dot products),
  *    never rounded doubles;
  *  - money sums go through decimal(18,2);
  *  - DuckDB regexp_replace needs the explicit 'g' flag (Spark is global
  *    by default);
  *  - integer division: Spark `(a / b).cast("long")` truncates, DuckDB
  *    `//` floors — identical for the non-negative values used here;
  *  - every query ends in a total ORDER BY mirrored by the oracle.
  */
object ExtQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------ relational (joins etc.)
    "ext_segment_revenue" -> ((s, dir) => Relational.segmentRevenue(s, dir)),
    "ext_status_revenue" -> ((s, dir) => Relational.statusRevenue(s, dir)),
    "ext_top_parts_per_brand" -> ((s, dir) => Relational.topPartsPerBrand(s, dir)),
    "ext_top_lineitems" -> ((s, dir) => Relational.topLineitems(s, dir)),
    "ext_suppliers_per_region" -> ((s, dir) => Relational.suppliersPerRegion(s, dir)),
    "ext_revenue_rollup" -> ((s, dir) => Relational.revenueRollup(s, dir)),
    "ext_lineitem_cube" -> ((s, dir) => Relational.lineitemCube(s, dir)),
    "ext_status_setops" -> ((s, dir) => Relational.statusSetOps(s, dir)),
    "ext_anti_customers" -> ((s, dir) => Relational.customersWithoutOrders(s, dir)),
    "ext_q21_sole_late" -> ((s, dir) => Relational.soleLateSuppliers(s, dir)),
    "ext_q22_idle_rich" -> ((s, dir) => Relational.idleRichCustomers(s, dir)),
    "ext_q15_top_supplier" -> ((s, dir) => Relational.topSupplier(s, dir)),
    "ext_q20_dominant_suppliers" -> ((s, dir) => Relational.dominantSuppliers(s, dir)),
    "ext_semi_customers" -> ((s, dir) => Relational.customersWithOpenOrders(s, dir)),
    "ext_q5_local_revenue" -> ((s, dir) => Relational.localRevenue(s, dir)),
    "ext_q2_min_cost" -> ((s, dir) => Relational.minCostSuppliers(s, dir)),
    "ext_q13_order_counts" -> ((s, dir) => Relational.orderCountHistogram(s, dir)),
    "ext_q14_promo_share" -> ((s, dir) => Relational.promoShare(s, dir)),
    "ext_q19_disjunctive" -> ((s, dir) => Relational.disjunctiveRevenue(s, dir)),
    "ext_q11_important_parts" -> ((s, dir) => Relational.importantParts(s, dir)),
    "ext_q7_volume_shipping" -> ((s, dir) => Relational.volumeShipping(s, dir)),
    "ext_q16_supplier_variety" -> ((s, dir) => Relational.supplierVariety(s, dir)),
    "ext_q9_product_profit" -> ((s, dir) => Relational.productProfit(s, dir)),
    "ext_q8_market_share" -> ((s, dir) => Relational.marketShare(s, dir)),
    "ext_q6_forecast" -> ((s, dir) => Relational.forecastRevenue(s, dir)),
    "ext_q10_returned_items" -> ((s, dir) => Relational.returnedItemRevenue(s, dir)),
    "ext_q12_priority_lines" -> ((s, dir) => Relational.priorityLineCounts(s, dir)),
    "corpus_manifest" -> ((s, dir) => Corpus.manifest(s, dir)),
    // ------------------------------------------------ events
    "ext_sessions" -> ((s, dir) => Sessionize.sessions(s, dir)),
    "ext_transitions" -> ((s, dir) => Sessionize.transitions(s, dir)),
    "ext_props_rollup" -> ((s, dir) => Sessionize.propsRollup(s, dir)),
    "ext_props_keys" -> ((s, dir) => Sessionize.propsKeys(s, dir)),
    "ext_bloom_audit" -> ((s, dir) => Sessionize.bloomAudit(s, dir)),
    "ext_gap_histogram" -> ((s, dir) => Sessionize.gapHistogram(s, dir)),
    "ext_disorder" -> ((s, dir) => Sessionize.disorderCensus(s, dir)),
    "ext_user_lifetime" -> ((s, dir) => Sessionize.userLifetime(s, dir)),
    "ext_conversion_lag" -> ((s, dir) => Sessionize.conversionLag(s, dir)),
    "ext_yoy_revenue" -> ((s, dir) => Relational.yoyRevenue(s, dir)),
    "ext_type_unpivot" -> ((s, dir) => Sessionize.typeUnpivot(s, dir)),
    "ext_integrity_audit" -> ((s, dir) => Relational.integrityAudit(s, dir)),
    "corpus_pack_stats" -> ((s, dir) => Corpus.packStats(s, dir)),
    "ann_cell_balance" -> ((s, dir) => Similarity.cellBalance(s, dir)),
    "ext_basket_pairs" -> ((s, dir) => Relational.basketPairs(s, dir)),
    "text_surprisal_mix" -> ((s, dir) => TextAnalysis.surprisalMix(s, dir)),
    "dedup_threshold_hist" -> ((s, dir) => Dedup.thresholdHist(s, dir)),
    "ext_fulfillment_lag" -> ((s, dir) => Relational.fulfillmentLag(s, dir)),
    "text_lang_confusion" -> ((s, dir) => TextAnalysis.langConfusion(s, dir)),
    "text_readability" -> ((s, dir) => TextAnalysis.readability(s, dir)),
    "text_fertility" -> ((s, dir) => TextAnalysis.fertility(s, dir)),
    "ext_weekday_revenue" -> ((s, dir) => Relational.weekdayRevenue(s, dir)),
    "corpus_shards" -> ((s, dir) => Corpus.shardBalance(s, dir)),
    "ann_nprobe_sweep" -> ((s, dir) => Similarity.nprobeSweep(s, dir)),
    "ext_hourly_spikes" -> ((s, dir) => Sessionize.hourlySpikes(s, dir)),
    "dedup_winnow_clusters" -> ((s, dir) => Dedup.winnowClusters(s, dir)),
    "corpus_batch_drift" -> ((s, dir) => Corpus.batchDrift(s, dir)),
    "ext_hourly_rollup" -> ((s, dir) => Sessionize.hourlyRollup(s, dir)),
    "ext_sliding_rollup" -> ((s, dir) => Sessionize.slidingRollup(s, dir)),
    "ext_asof_click" -> ((s, dir) => TemporalJoins.asofClickBeforePurchase(s, dir)),
    "ext_range_views" -> ((s, dir) => TemporalJoins.viewsBeforePurchase(s, dir)),
    "ext_salted_rollup" -> ((s, dir) => Sessionize.saltedTypeRollup(s, dir)),
    "ext_funnel" -> ((s, dir) => Sessionize.funnel(s, dir)),
    "ext_cms_hitters" -> ((s, dir) => Sessionize.cmsHitters(s, dir)),
    "ext_type_pivot" -> ((s, dir) => Sessionize.typePivot(s, dir)),
    "ext_exact_percentiles" -> ((s, dir) => Sessionize.exactPercentiles(s, dir)),
    "ext_mad_outliers" -> ((s, dir) => Sessionize.madOutliers(s, dir)),
    "ext_retention" -> ((s, dir) => Sessionize.retention(s, dir)),
    // Batch twins of the two streaming-only operators: the attribution
    // twin runs the SAME interval-join operator code on bounded input;
    // the profile twin states the stateful processors' fold as a groupBy.
    "stream_attribution_batch" -> ((s, dir) =>
      graft.engine.streaming.EventStream.attributedPurchasesBatch(s, dir)),
    "stream_profiles_batch" -> ((s, dir) =>
      graft.engine.streaming.EventStream.userProfilesBatch(s, dir)),
    // the session twin runs the SAME native session_window operator on
    // bounded input; the dedup twin states the streaming LSH's emitted
    // set as the (band,bucket) equi-join it is, sharing the banded
    // signature projection code with the stream.
    "stream_sessions_batch" -> ((s, dir) =>
      graft.engine.streaming.EventStream.sessionStatsBatch(s, dir)),
    "stream_dedup_batch" -> ((s, dir) =>
      graft.engine.streaming.DedupStream.pairsBatch(s, dir)),
    // the timer twin states the event-time-timer sessionizer's fold on
    // its millisecond clock (StreamingSpec ties it to the real RocksDB
    // processor on the same fixture); the last-touch twin runs the
    // chained interval-join → per-purchase rollup composition.
    "stream_timer_sessions_batch" -> ((s, dir) =>
      graft.engine.streaming.EventStream.timerSessionsBatch(s, dir)),
    "stream_last_touch_batch" -> ((s, dir) =>
      graft.engine.streaming.EventStream.lastTouchBatch(s, dir)),
    // sketch-accuracy audit: exact values + within-band flags comparing
    // the HLL/GK sketches against their exact counterparts in-engine;
    // deterministic output, fully hash-checkable (the oracle computes the
    // same exact values and asserts literal all-true flags).
    "ext_sketches" -> ((s, dir) => Sessionize.sketchAudit(s, dir)),
    // ------------------------------------------------ text analysis
    "text_analyze" -> ((s, dir) =>
      TextAnalysis.analyze(s, dir).orderBy(col("doc_id"))),
    "text_langid" -> ((s, dir) =>
      TextAnalysis.langId(s, dir).orderBy(col("doc_id"))),
    "text_quality_rollup" -> ((s, dir) => TextAnalysis.qualityRollup(s, dir)),
    "text_winnow" -> ((s, dir) =>
      TextAnalysis.winnowFingerprint(s, dir).orderBy(col("doc_id"))),
    // ------------------------------------------------ corpus assembly
    "corpus_split" -> ((s, dir) => Corpus.splitAssign(s, dir)),
    "corpus_pack" -> ((s, dir) => Corpus.packSequences(s, dir)),
    "corpus_sample" -> ((s, dir) => Corpus.stratifiedSample(s, dir)),
    "corpus_mix" -> ((s, dir) => Corpus.weightedInterleave(s, dir)),
    "corpus_clean" -> ((s, dir) => Corpus.qualityClean(s, dir)),
    "corpus_contamination" -> ((s, dir) => Corpus.contamination(s, dir)),
    "corpus_firewall13" -> ((s, dir) => Dedup.firewall13(s, dir)),
    "corpus_decontaminated" -> ((s, dir) => Corpus.decontaminated(s, dir)),
    // ------------------------------------------------ dedup
    "dedup_exact" -> ((s, dir) => Dedup.exact(s, dir)),
    "dedup_bow" -> ((s, dir) => Dedup.bagOfWords(s, dir)),
    "dedup_ngram_pairs" -> ((s, dir) => Dedup.ngramJaccardPairs(s, dir)),
    "dedup_simhash" -> ((s, dir) => Dedup.simhash(s, dir)),
    "dedup_simhash_pairs" -> ((s, dir) => Dedup.simhashPairs(s, dir)),
    "dedup_minhash_pairs" -> ((s, dir) => Dedup.minhashPairs(s, dir)),
    "dedup_minhash_recall" -> ((s, dir) => Dedup.minhashRecall(s, dir)),
    "dedup_embed_pairs" -> ((s, dir) => Dedup.embedCosinePairs(s, dir)),
    "dedup_clusters" -> ((s, dir) => Dedup.simhashClusters(s, dir)),
    "dedup_cluster_sizes" -> ((s, dir) => Dedup.clusterSizeHist(s, dir)),
    "corpus_length_stats" -> ((s, dir) => Corpus.lengthStats(s, dir)),
    "dedup_semantic_clusters" -> ((s, dir) => Dedup.semanticClusters(s, dir)),
    "dedup_canonical" -> ((s, dir) => Dedup.canonicalByQuality(s, dir)),
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
    "text_keywords" -> ((s, dir) => TextAnalysis.keywords(s, dir)),
    "text_tfidf_topk" -> ((s, dir) => TextAnalysis.tfidfTopK(s, dir)),
    "rag_chunk_topk" -> ((s, dir) => TextAnalysis.ragChunkTopK(s, dir)),
    "rag_bm25_topk" -> ((s, dir) => TextAnalysis.bm25ChunkTopK(s, dir)),
    "corpus_dsir_score" -> ((s, dir) => Corpus.dsirScore(s, dir)),
    "corpus_tv_drift" -> ((s, dir) => Corpus.tvDrift(s, dir)),
    "text_bpe_merges" -> ((s, dir) => TextAnalysis.bpeMerges(s, dir)),
    "text_repetition" -> ((s, dir) =>
      TextAnalysis.repetition(s, dir).orderBy(col("doc_id"))),
    "text_surprisal" -> ((s, dir) =>
      TextAnalysis.surprisal(s, dir).orderBy(col("doc_id"))),
    "text_bigram_surprisal" -> ((s, dir) =>
      TextAnalysis.bigramSurprisal(s, dir)),
    "text_pii_redact" -> ((s, dir) =>
      TextAnalysis.piiRedact(s, dir).orderBy(col("c_custkey"))),
    "dedup_incremental" -> ((s, dir) =>
      Dedup.incremental(s, dir).orderBy(col("doc_id"))),
    "corpus_chunks" -> ((s, dir) =>
      Corpus.chunks(s, dir).orderBy(col("doc_id"), col("chunk_no"))),
    // ------------------------------------------------ multimodal
    "mm_features" -> ((s, dir) => {
      import s.implicits._
      Multimodal.decodeFeatures(s, dir).toDF().orderBy(col("doc_id"))
    }),
    "mm_format_rollup" -> ((s, dir) => Multimodal.formatRollup(s, dir)),
    "mm_dupes" -> ((s, dir) => Multimodal.payloadDupes(s, dir)),
    "ext_key_skew" -> ((s, dir) => Relational.keySkew(s, dir)),
    "mm_resized" -> ((s, dir) => {
      import s.implicits._
      Multimodal.resizeFeatures(s, dir).toDF().orderBy(col("doc_id"))
    }),
    // ------------------------------------------------ round-6 additions
    "text_vocab" -> ((s, dir) => TextAnalysis.vocab(s, dir)),
    "text_ngram_census" -> ((s, dir) => TextAnalysis.ngramCensus(s, dir)),
    "text_freq_spectrum" -> ((s, dir) => TextAnalysis.freqSpectrum(s, dir)),
    "text_distinctive_ngrams" ->
      ((s, dir) => TextAnalysis.distinctiveNgrams(s, dir)),
    "corpus_temperature" -> ((s, dir) => Corpus.temperatureWeights(s, dir)),
    "corpus_epochs_plan" -> ((s, dir) => Corpus.epochsPlan(s, dir)),
    "corpus_dedup_weights" -> ((s, dir) => Corpus.dedupWeights(s, dir)),
    "corpus_dup_quality" -> ((s, dir) => Corpus.dupQuality(s, dir)),
    "dedup_containment" -> ((s, dir) => Dedup.containmentPairs(s, dir)),
    "dedup_substring" -> ((s, dir) => Dedup.substringSpans(s, dir)),
    "dedup_span_coverage" -> ((s, dir) => Dedup.spanCoverage(s, dir)),
    "dedup_span_removal" -> ((s, dir) => Dedup.spanRemoval(s, dir)),
    "layout_zorder" -> ((s, dir) =>
      graft.engine.ingest.Layout.zorderStats(s, dir)),
    "ann_srp_topk" -> ((s, dir) => Similarity.srpTopK(s, dir)),
    "dedup_source_stats" -> ((s, dir) => Dedup.dupStats(s, dir)),
    "dedup_source_overlap" -> ((s, dir) => Dedup.sourceOverlap(s, dir)),
    "corpus_quota_sample" -> ((s, dir) => Corpus.quotaSample(s, dir)),
    "corpus_pipeline" -> ((s, dir) => Corpus.pipeline(s, dir)),
    "ann_srp_recall" -> ((s, dir) => Similarity.srpRecall(s, dir)),
    "corpus_cell_quality" -> ((s, dir) => Similarity.cellQuality(s, dir)),
    "text_novelty" -> ((s, dir) => TextAnalysis.novelty(s, dir)),
    "ann_pq_recall" -> ((s, dir) => Similarity.pqRecall(s, dir)),
    "ext_scd2" -> ((s, dir) => Relational.scd2(s, dir)),
    "ext_q3_unshipped" -> ((s, dir) => Relational.unshippedOrders(s, dir)),
    "dedup_pagerank" -> ((s, dir) => Dedup.pagerank(s, dir)),
    "corpus_epoch_order" -> ((s, dir) => Corpus.epochOrder(s, dir)),
    "ext_q1_pricing" -> ((s, dir) => Relational.pricingSummary(s, dir)),
    "ext_q18_large_orders" -> ((s, dir) => Relational.largeOrders(s, dir)),
    "ext_q17_small_qty" -> ((s, dir) => Relational.smallQtyRevenue(s, dir)),
    "mm_phash_pairs" -> ((s, dir) => Multimodal.phashPairs(s, dir)),
    "ext_q4_late_priorities" -> ((s, dir) => Relational.latePriorities(s, dir)),
    "ext_range_frame_revenue" -> ((s, dir) => Relational.nearbyRevenue(s, dir)),
    "mm_frame_samples" -> ((s, dir) => {
      import s.implicits._
      Multimodal.frameSamples(s, dir).toDF()
        .orderBy(col("doc_id"), col("frame_no"))
    }),
    "text_gopher_rules" -> ((s, dir) => TextAnalysis.gopherRules(s, dir)),
    "corpus_hash_sample" -> ((s, dir) => Corpus.hashSample(s, dir)),
    "ext_cdc_merge" -> ((s, dir) => Changelog.mergedSnapshot(s, dir)),
    "ext_lateness_audit" -> ((s, dir) => Sessionize.latenessAudit(s, dir)),
    "ann_range_search" -> ((s, dir) => Similarity.ivfRangeSearch(s, dir)),
    "ann_filtered_search" -> ((s, dir) => Similarity.filteredTopK(s, dir)),
    "corpus_snapshot_diff" -> ((s, dir) => Corpus.snapshotDiff(s, dir)),
    "dedup_triangles" -> ((s, dir) => Dedup.triangles(s, dir)),
    "ext_forward_fill" -> ((s, dir) => Sessionize.forwardFill(s, dir)),
    "ext_dau_mau" -> ((s, dir) => Sessionize.dauMau(s, dir)),
    "ext_benford" -> ((s, dir) => Sessionize.benfordAudit(s, dir)),
    "mm_phash_clusters" -> ((s, dir) => Multimodal.phashClusters(s, dir)),
    "ext_rfm" -> ((s, dir) => Sessionize.rfmSegments(s, dir)),
    "ext_value_concentration" ->
      ((s, dir) => Sessionize.valueConcentration(s, dir)),
  )

  // ------------------------------------------------------------- oracles

  /** Shared DuckDB fragments. */
  /** Shared events prelude: the maximal projection the events oracles
    * need (DuckDB prunes unused columns, so the superset costs nothing);
    * one definition point instead of 12 near-identical `WITH e AS`
    * preludes that could drift apart. */
  private val eventsE =
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
  private val docQuality =
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

  private val toks =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |                             x -> x != '') AS t
      |  FROM documents
      |)""".stripMargin

  private val shingles3 = toks +
    """, sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(t) >= 3 THEN
      |      list_distinct(list_transform(range(1, len(t) - 1),
      |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
      |    ELSE [] END AS sh
      |  FROM toks
      |)""".stripMargin

  /** Positional-shingle shared-span chain (dedup_substring /
    * dedup_span_coverage): `spans` = maximal diagonal runs ≥ 10 tokens
    * with both start positions, BIGINT throughout.
    */
  private val spanChain = toks +
    """, pos AS (
      |  SELECT doc_id, t, unnest(range(0, len(t) - 2)) AS p
      |  FROM toks WHERE len(t) >= 3
      |), psh AS (
      |  SELECT doc_id, p,
      |    md5(t[p+1] || ' ' || t[p+2] || ' ' || t[p+3]) AS fp
      |  FROM pos
      |), bkt AS (
      |  SELECT doc_id, p, fp, count(*) OVER (PARTITION BY fp) AS df
      |  FROM psh
      |), prs AS (
      |  SELECT x.doc_id AS doc_a, x.p AS pa, y.doc_id AS doc_b, y.p AS pb
      |  FROM bkt x JOIN bkt y ON x.fp = y.fp AND x.doc_id < y.doc_id
      |  WHERE x.df <= 100
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

  private val tokHash =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                                    x -> x != '')) AS tok
      |  FROM documents
      |), h AS (
      |  SELECT doc_id, ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h FROM tok
      |)""".stripMargin

  private val simhashSig = tokHash +
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
  private val simhashCcChain =
    """, bands AS (
      |  SELECT doc_id, simhash, band,
      |    (simhash >> (band * 15)) & 32767 AS band_val
      |  FROM sig, range(0, 4) r(band)
      |), edges AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
      |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
      |), edges2 AS (
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

  private val quantized =
    """WITH v AS (
      |  SELECT vec_id, label, i,
      |    CAST(floor(embedding[i]::DOUBLE * 1000) AS BIGINT) AS q
      |  FROM embeddings, range(1, 65) t(i)
      |)""".stripMargin

  /** The ann_kmeans training replay (two Lloyd iterations, exact
    * integer / floor-mean arithmetic, explicit tie-breaks), ending in
    * `fin` = the final (vec_id, cell_id, dist) assignment — shared by
    * ann_kmeans and the ann_cell_balance audit so both read the
    * identical trained index.
    */
  private val kmeansFin = quantized +
    """, c0 AS (
      |  SELECT vec_id AS cell_id, i, q AS c FROM v WHERE vec_id < 16
      |), d1 AS (
      |  SELECT v.vec_id, c.cell_id,
      |    CAST(sum((v.q - c.c) * (v.q - c.c)) AS BIGINT) AS dist
      |  FROM v JOIN c0 c ON v.i = c.i GROUP BY 1, 2
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

  /** One sweep point of the ann_nprobe_sweep oracle: probe the trained
    * cells at width `p`, rank candidates, count overlap with the exact
    * baseline `bf`. Appended after [[kmeansFin]] + the bf/tot CTEs.
    */
  private def nprobeBlock(p: Int): String =
    s""", pr$p AS (
       |  SELECT vec_id AS query_id, cell_id FROM (
       |    SELECT vec_id, cell_id,
       |      row_number() OVER (PARTITION BY vec_id
       |                         ORDER BY dist, cell_id) AS crank
       |    FROM d2 WHERE vec_id % 50 = 0) WHERE crank <= $p
       |), cand$p AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |    CAST(sum(q.q * n.q) AS BIGINT) AS dot
       |  FROM pr$p p
       |  JOIN fin a ON a.cell_id = p.cell_id AND a.vec_id != p.query_id
       |  JOIN v q ON q.vec_id = p.query_id
       |  JOIN v n ON n.vec_id = a.vec_id AND n.i = q.i
       |  GROUP BY 1, 2
       |), top$p AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |                         ORDER BY dot DESC, neighbor_id) AS rank
       |    FROM cand$p) WHERE rank <= 10
       |), row$p AS (
       |  SELECT $p::BIGINT AS nprobe, n_queries, n_true,
       |    (SELECT count(*)::BIGINT
       |     FROM bf JOIN top$p USING (query_id, neighbor_id)) AS n_overlap
       |  FROM tot
       |)""".stripMargin

  /** SRP cosine-pair chain (shared by dedup_embed_pairs /
    * dedup_semantic_clusters): appended after [[quantized]], yields
    * `sprs` = (va, vb, dot, na, nb) pairs passing the exact 2/5 cosine
    * threshold. Ends after the closing paren of `sprs`, so callers
    * either start their SELECT directly or continue the CTE list with
    * a leading ", ".
    */
  private val srpPairChain =
    """, c AS (
      |  SELECT p, i,
      |    CASE WHEN ('0x' || substring(md5(p || '_' || i), 1, 1))::INT % 2 = 1
      |         THEN 1 ELSE -1 END AS cc
      |  FROM range(0, 16) r(p), range(1, 65) s(i)
      |), sigv AS (
      |  SELECT vec_id,
      |    CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END)
      |         AS BIGINT) AS sg
      |  FROM (SELECT vec_id, p, sum(q * cc) AS proj
      |        FROM v JOIN c ON v.i = c.i GROUP BY 1, 2)
      |  GROUP BY vec_id
      |), norms AS (
      |  SELECT vec_id, sum(q * q) AS n2 FROM v GROUP BY 1
      |), bands AS (
      |  SELECT vec_id, band, (sg >> (band * 4)) & 15 AS bv
      |  FROM sigv, range(0, 4) r(band)
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
  private val pqChain =
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
  private val ivfPqChain =
    """, kc0 AS (
      |  SELECT vec_id AS cell_id, i, q AS c FROM v WHERE vec_id < 16
      |), kd1 AS (
      |  SELECT v.vec_id, c.cell_id,
      |    CAST(sum((v.q - c.c) * (v.q - c.c)) AS BIGINT) AS dist
      |  FROM v JOIN kc0 c ON v.i = c.i GROUP BY 1, 2
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
      |    FROM kd2 WHERE vec_id % 50 = 0) WHERE crank <= 4
      |), ccand AS (
      |  SELECT p.query_id, a.vec_id AS neighbor_id
      |  FROM kprobes p
      |  JOIN ka2 a ON a.cell_id = p.cell_id AND a.vec_id != p.query_id
      |), qs AS (
      |  SELECT vec_id AS query_id, m, j, q FROM sv WHERE vec_id % 50 = 0
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
  private def keySkewOracle(key: String): String =
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
  private val media =
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

  def oracleSql: Map[String, String] = Map(
    "ext_segment_revenue" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "ext_status_revenue" ->
      """SELECT o_orderstatus, l_returnflag, count(*) AS n_lines,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS disc_revenue_c,
        |  CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus, l_returnflag
        |ORDER BY o_orderstatus, l_returnflag""".stripMargin,

    "ext_top_parts_per_brand" ->
      """SELECT p_brand, p_partkey, p_name, price_c, rank FROM (
        |  SELECT p_brand, p_partkey, p_name,
        |    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c,
        |    row_number() OVER (PARTITION BY p_brand
        |                       ORDER BY p_retailprice DESC, p_partkey) AS rank
        |  FROM part)
        |WHERE rank <= 3 ORDER BY p_brand, rank""".stripMargin,

    "ext_top_lineitems" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c
        |FROM lineitem
        |ORDER BY price_c DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    "ext_suppliers_per_region" ->
      """SELECT r_name, count(*) AS n_suppliers,
        |  CAST(sum(CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_acctbal_c
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "ext_revenue_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "ext_status_setops" ->
      """WITH f AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |     o AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |SELECT * FROM (
        |  SELECT 'except_f_minus_o' AS op,
        |         (SELECT count(*) FROM (SELECT * FROM f EXCEPT SELECT * FROM o)) AS n_custkeys
        |  UNION ALL
        |  SELECT 'intersect_f_o',
        |         (SELECT count(*) FROM (SELECT * FROM f INTERSECT SELECT * FROM o))
        |  UNION ALL
        |  SELECT 'union_f_o',
        |         (SELECT count(DISTINCT o_custkey) FROM (SELECT * FROM f UNION ALL SELECT * FROM o))
        |) ORDER BY op""".stripMargin,

    // Twin of the streaming interval join: views attributed to purchases by
    // the same user within [purchase − 1h, purchase], inclusive both ends.
    "stream_attribution_batch" ->
      """SELECT p.event_id, p.user_id,
        |  epoch_us(p.ts) AS purchase_us, epoch_us(v.ts) AS view_us,
        |  CAST(floor(p."value" * 100 + 0.5) AS BIGINT) AS value_c
        |FROM events p JOIN events v ON v.user_id = p.user_id
        |WHERE p.event_type = 'purchase' AND v.event_type = 'view'
        |  AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
        |ORDER BY p.event_id, view_us""".stripMargin,

    // Twin of the stateful profile processors: count / Σ floor(value·100) /
    // last-seen truncated to millis then expressed in micros (the
    // processors read Timestamp.getTime, a millisecond clock).
    "stream_profiles_batch" ->
      (eventsE + """
        |SELECT user_id, count(*)::BIGINT AS n_events,
        |  CAST(sum(value_c) AS BIGINT) AS sum_value_c,
        |  CAST(max((tsu // 1000) * 1000) AS BIGINT) AS last_seen_us
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin),

    // Twin of the native session_window sessionizer: gaps-and-islands with
    // a 30-minute break; window end = last event + gap (the session_window
    // contract).
    "stream_sessions_batch" ->
      (eventsE + """, m AS (
        |  SELECT user_id, tsu, value_c,
        |    CASE WHEN lag(tsu) OVER w IS NULL
        |      OR tsu - lag(tsu) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu)
        |), s AS (
        |  SELECT user_id, tsu, value_c,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY tsu
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m
        |)
        |SELECT user_id, min(tsu) AS session_start_us,
        |  max(tsu) + 1800000000 AS session_end_us,
        |  count(*)::BIGINT AS n_events, sum(value_c)::BIGINT AS sum_value_c
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin),

    // Twin of the event-time-TIMER sessionizer: the same gaps-and-islands
    // fold as stream_sessions_batch but on the processor's MILLISECOND
    // clock (Timestamp.getTime truncates micros) — ties on a truncated
    // time are never a break (diff 0), so the fold is tie-order-free.
    "stream_timer_sessions_batch" ->
      (eventsE + """, t AS (
        |  SELECT user_id, (tsu // 1000) * 1000 AS t_us, value_c FROM e
        |), m AS (
        |  SELECT user_id, t_us, value_c,
        |    CASE WHEN lag(t_us) OVER w IS NULL
        |      OR t_us - lag(t_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY t_us)
        |), s AS (
        |  SELECT user_id, t_us, value_c,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY t_us
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m
        |)
        |SELECT user_id, min(t_us) AS session_start_us,
        |  max(t_us) + 1800000000 AS session_end_us,
        |  count(*)::BIGINT AS n_events, sum(value_c)::BIGINT AS sum_value_c
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin),

    // Twin of the chained interval-join → rollup composition: per
    // purchase, the LAST in-horizon view and the attributed view count.
    "stream_last_touch_batch" ->
      """SELECT p.event_id, p.user_id,
        |  epoch_us(p.ts) AS purchase_us,
        |  max(epoch_us(v.ts)) AS last_view_us,
        |  count(*)::BIGINT AS n_views,
        |  CAST(floor(p."value" * 100 + 0.5) AS BIGINT) AS value_c
        |FROM events p JOIN events v ON v.user_id = p.user_id
        |WHERE p.event_type = 'purchase' AND v.event_type = 'view'
        |  AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
        |GROUP BY 1, 2, 3, 6
        |ORDER BY p.event_id""".stripMargin,

    "ext_sessions" ->
      (eventsE + """, l AS (
        |  SELECT *, lag(tsu) OVER (PARTITION BY user_id
        |                           ORDER BY tsu, event_id) AS prev
        |  FROM e
        |), s AS (
        |  SELECT *, CASE WHEN prev IS NULL OR tsu - prev > 1800000000
        |                 THEN 1 ELSE 0 END AS new_s
        |  FROM l
        |), t AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id
        |    ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM s
        |)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  count(*) AS n_events,
        |  min(tsu) AS session_start_us, max(tsu) AS session_end_us,
        |  max(tsu) - min(tsu) AS span_us,
        |  CAST(sum(value_c) AS BIGINT) AS sum_value_c
        |FROM t GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin),

    // Bloom filter in exact bit math: purchasers in, view-only users
    // probed (true non-members), measured FPP in exact ppm.
    "ext_bloom_audit" ->
      """WITH members AS (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        |), probes AS (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
        |  EXCEPT SELECT user_id FROM members
        |), mpos AS (
        |  SELECT ('0x' || substr(md5(i || ':' || user_id), 1, 15))::BIGINT
        |    % 4096 AS pos
        |  FROM members, range(0, 4) t(i)
        |), slots AS (
        |  SELECT pos // 64 AS slot,
        |    bit_or(CASE WHEN pos % 64 = 63
        |           THEN (-9223372036854775807 - 1)::BIGINT
        |           ELSE 1::BIGINT << (pos % 64)::INT END) AS bits
        |  FROM mpos GROUP BY 1
        |), ppos AS (
        |  SELECT user_id,
        |    ('0x' || substr(md5(i || ':' || user_id), 1, 15))::BIGINT
        |      % 4096 AS pos
        |  FROM probes, range(0, 4) t(i)
        |), hit AS (
        |  SELECT p.user_id,
        |    min(coalesce((s.bits >> (p.pos % 64)::INT) & 1, 0)) AS all_set
        |  FROM ppos p LEFT JOIN slots s ON p.pos // 64 = s.slot
        |  GROUP BY 1
        |)
        |SELECT (SELECT count(*) FROM members)::BIGINT AS n_members,
        |  count(*)::BIGINT AS n_probes,
        |  sum(all_set)::BIGINT AS n_false_positive,
        |  (sum(all_set) * 1000000 // count(*))::BIGINT AS fpp_ppm
        |FROM hit""".stripMargin,

    // Schema-drift census: every props key per event type, presence ppm.
    "ext_props_keys" ->
      """WITH pk AS (
        |  SELECT event_type, unnest(json_keys(props)) AS key FROM events
        |), t AS (
        |  SELECT event_type, count(*)::BIGINT AS n_events
        |  FROM events GROUP BY 1
        |), c AS (
        |  SELECT event_type, key, count(*)::BIGINT AS n_present
        |  FROM pk GROUP BY 1, 2
        |)
        |SELECT c.event_type, c.key, c.n_present, t.n_events,
        |  (c.n_present * 1000000 // t.n_events)::BIGINT AS present_ppm
        |FROM c JOIN t USING (event_type)
        |ORDER BY event_type, key""".stripMargin,

    // JSON props field census per event type.
    "ext_props_rollup" ->
      """SELECT event_type, count(*)::BIGINT AS n_events,
        |  CAST(sum(CASE WHEN json_extract(props, '$.k') IS NULL
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_k,
        |  CAST(sum(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
        |  min(json_extract(props, '$.k')::BIGINT)::BIGINT AS min_k,
        |  max(json_extract(props, '$.k')::BIGINT)::BIGINT AS max_k,
        |  count(DISTINCT json_extract(props, '$.k')::BIGINT)::BIGINT
        |    AS n_distinct_k
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

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

    // Log2-bucketed inter-arrival gaps per (user, type) timeline.
    "ext_gap_histogram" ->
      (eventsE + """, l AS (
        |  SELECT event_type,
        |    tsu - lag(tsu) OVER (PARTITION BY user_id, event_type
        |                         ORDER BY tsu, event_id) AS gap
        |  FROM e
        |)
        |SELECT event_type,
        |  (CASE WHEN gap = 0 THEN 0
        |        ELSE length(bin(gap)) END)::BIGINT AS bucket,
        |  count(*)::BIGINT AS n_gaps,
        |  min(gap)::BIGINT AS min_gap_us, max(gap)::BIGINT AS max_gap_us
        |FROM l WHERE gap IS NOT NULL
        |GROUP BY 1, 2 ORDER BY event_type, bucket""".stripMargin),

    // Watermark-sizing disorder census: lateness vs the running
    // event-time high-water mark in arrival (event_id) order.
    "ext_disorder" ->
      (eventsE + """, l AS (
        |  SELECT event_type,
        |    greatest(coalesce(max(tsu) OVER (ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), tsu)
        |      - tsu, 0) AS late
        |  FROM e
        |)
        |SELECT event_type,
        |  (CASE WHEN late = 0 THEN 0
        |        ELSE length(bin(late)) END)::BIGINT AS bucket,
        |  count(*)::BIGINT AS n_events,
        |  min(late)::BIGINT AS min_late_us, max(late)::BIGINT AS max_late_us
        |FROM l GROUP BY 1, 2 ORDER BY event_type, bucket""".stripMargin),

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

    // Co-purchased part pairs, top-20 by distinct containing orders.
    "ext_basket_pairs" ->
      """WITH p AS (
        |  SELECT a.l_orderkey AS ok, a.l_partkey AS part_a,
        |    b.l_partkey AS part_b
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |)
        |SELECT part_a, part_b, count(DISTINCT ok)::BIGINT AS n_orders
        |FROM p GROUP BY 1, 2
        |ORDER BY n_orders DESC, part_a, part_b LIMIT 20""".stripMargin,

    // Pivot -> unpivot round trip: equals the plain long-form census.
    "ext_type_unpivot" ->
      """SELECT user_id, event_type, count(*)::BIGINT AS n
        |FROM events GROUP BY 1, 2 ORDER BY user_id, event_type""".stripMargin,

    // One row per declared constraint; healthy tables report zeros.
    "ext_integrity_audit" ->
      """SELECT 'customer_negative_balance' AS check_name,
        |  count(*)::BIGINT AS n_rows,
        |  CAST(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violations,
        |  CAST(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) * 1000000
        |       // count(*) AS BIGINT) AS violation_ppm
        |FROM customer
        |UNION ALL
        |SELECT 'lineitem_fk_orders', count(*)::BIGINT,
        |  CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
        |       AS BIGINT),
        |  CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
        |       * 1000000 // count(*) AS BIGINT)
        |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |UNION ALL
        |SELECT 'lineitem_qty_domain', count(*)::BIGINT,
        |  CAST(sum(CASE WHEN l_quantity <= 0 OR l_quantity > 50
        |               THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(sum(CASE WHEN l_quantity <= 0 OR l_quantity > 50
        |               THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'orders_fk_customer', count(*)::BIGINT,
        |  CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |       AS BIGINT),
        |  CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |       * 1000000 // count(*) AS BIGINT)
        |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |UNION ALL
        |SELECT 'orders_pk_unique', CAST(sum(n) AS BIGINT),
        |  CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT),
        |  CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) * 1000000
        |       // sum(n) AS BIGINT)
        |FROM (SELECT o_orderkey, count(*)::BIGINT AS n
        |      FROM orders GROUP BY 1)
        |ORDER BY check_name""".stripMargin,

    // First-view -> first-later-purchase lag, log2 buckets.
    "ext_conversion_lag" ->
      """WITH f AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p
        |  FROM events GROUP BY 1
        |), l AS (
        |  SELECT p - v AS lag_us FROM f WHERE p > v
        |)
        |SELECT length(bin(lag_us))::BIGINT AS bucket,
        |  count(*)::BIGINT AS n_users,
        |  min(lag_us)::BIGINT AS min_lag_us, max(lag_us)::BIGINT AS max_lag_us
        |FROM l GROUP BY 1 ORDER BY bucket""".stripMargin,

    // Monthly revenue with exact (year-1, month) alignment.
    "ext_yoy_revenue" ->
      """WITH mth AS (
        |  SELECT year(o_orderdate)::BIGINT AS y,
        |    month(o_orderdate)::BIGINT AS m, count(*)::BIGINT AS n_orders,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |         AS BIGINT) AS revenue_c
        |  FROM orders GROUP BY 1, 2
        |)
        |SELECT a.y, a.m, a.n_orders, a.revenue_c,
        |  b.revenue_c AS prev_revenue_c,
        |  a.revenue_c - b.revenue_c AS yoy_delta_c
        |FROM mth a LEFT JOIN mth b ON b.y = a.y - 1 AND b.m = a.m
        |ORDER BY a.y, a.m""".stripMargin,

    // Active-days population histogram from the per-user lifetime fold.
    "ext_user_lifetime" ->
      (eventsE + """, u AS (
        |  SELECT user_id, count(DISTINCT day) AS active_days,
        |    count(*) AS n_events, max(day) - min(day) + 1 AS span_days
        |  FROM e GROUP BY 1
        |)
        |SELECT active_days::BIGINT AS active_days,
        |  count(*)::BIGINT AS n_users, sum(n_events)::BIGINT AS n_events,
        |  sum(span_days)::BIGINT AS sum_span_days,
        |  max(span_days)::BIGINT AS max_span_days
        |FROM u GROUP BY 1 ORDER BY active_days""".stripMargin),

    // First-order event-type transition matrix with per-from shares.
    "ext_transitions" ->
      (eventsE + """, l AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY tsu, event_id) AS next_type
        |  FROM e
        |), c AS (
        |  SELECT event_type AS from_type, next_type AS to_type,
        |    count(*)::BIGINT AS n
        |  FROM l WHERE next_type IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT from_type, to_type, n,
        |  (n * 1000000 // sum(n) OVER (PARTITION BY from_type))::BIGINT
        |    AS share_ppm
        |FROM c ORDER BY from_type, to_type""".stripMargin),

    "ext_lineitem_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n_lines,
        |  CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "ext_anti_customers" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c.c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "ext_semi_customers" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c.c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,

    "ext_salted_rollup" ->
      (eventsE + """
        |SELECT event_type, count(*) AS n_events,
        |  CAST(sum(value_c) AS BIGINT) AS sum_value_c,
        |  min(tsu) AS first_ts_us, max(tsu) AS last_ts_us
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin),

    "ext_asof_click" ->
      (eventsE + """, c AS (
        |  SELECT user_id, tsu, max(event_id) AS click_id
        |  FROM e WHERE event_type = 'click' GROUP BY 1, 2
        |), p AS (
        |  SELECT event_id AS purchase_id, user_id, tsu
        |  FROM e WHERE event_type = 'purchase'
        |)
        |SELECT purchase_id, p.tsu AS purchase_ts_us, p.user_id,
        |  c.click_id, c.tsu AS click_ts_us, p.tsu - c.tsu AS gap_us
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.tsu >= c.tsu
        |ORDER BY purchase_id""".stripMargin),

    "ext_range_views" ->
      (eventsE + """, p AS (
        |  SELECT event_id AS purchase_id, user_id, tsu
        |  FROM e WHERE event_type = 'purchase'
        |), v AS (
        |  SELECT event_id AS view_id, user_id, tsu AS view_ts
        |  FROM e WHERE event_type = 'view'
        |)
        |SELECT purchase_id, count(view_id) AS n_views
        |FROM p LEFT JOIN v
        |  ON p.user_id = v.user_id
        | AND v.view_ts BETWEEN p.tsu - 3600000000 AND p.tsu
        |GROUP BY purchase_id ORDER BY purchase_id""".stripMargin),

    "ext_hourly_rollup" ->
      (eventsE + """
        |SELECT tsu - tsu % 3600000000 AS hour_start_us,
        |  event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(value_c) AS BIGINT) AS sum_value_c
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // Sliding windows: every event is in exactly 2 epoch-aligned 1h/30min
    // windows — floor30(us) and floor30(us) - 30min — so the oracle
    // expands each event twice, no containment filter needed.
    "ext_sliding_rollup" ->
      (eventsE + """
        |SELECT (tsu - tsu % 1800000000)
        |         - s.i * 1800000000 AS win_start_us,
        |  event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(value_c) AS BIGINT) AS sum_value_c
        |FROM e, unnest([0, 1]) AS s(i)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // Sketch-accuracy audit: the oracle computes the exact side (count
    // distinct + ceil(p·n) discrete percentiles over the same
    // (value_c, event_id) order the engine uses) and asserts the
    // within-band flags are all true — a healthy sketch is within 5% of
    // exact, so the engine's computed flags hash-match these literals.
    "ext_sketches" ->
      (eventsE + """, r AS (
        |  SELECT event_type, user_id, value_c,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY value_c, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM e
        |)
        |SELECT event_type,
        |  count(DISTINCT user_id)::BIGINT AS n_users,
        |  1::BIGINT AS users_ok,
        |  min(CASE WHEN rn = (n + 1) // 2 THEN value_c END) AS p50_c,
        |  min(CASE WHEN rn = (n * 95 + 99) // 100 THEN value_c END) AS p95_c,
        |  min(CASE WHEN rn = (n * 99 + 99) // 100 THEN value_c END) AS p99_c,
        |  1::BIGINT AS p50_ok, 1::BIGINT AS p95_ok, 1::BIGINT AS p99_ok
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin),

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

    // ISO day-of-week seasonality, integer cents.
    "ext_weekday_revenue" ->
      """SELECT isodow(o_orderdate)::BIGINT AS dow_iso,
        |  count(*)::BIGINT AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |       AS BIGINT) AS revenue_c
        |FROM orders GROUP BY 1 ORDER BY dow_iso""".stripMargin,

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

    "text_winnow" ->
      """SELECT doc_id,
        |  list_min(list_transform(range(1, greatest(length(text) - 15, 1) + 1),
        |    i -> ('0x' || substring(md5(substring(text, i::INT, 16)), 1, 15))::BIGINT))
        |    AS fingerprint_h,
        |  len(list_distinct(list_transform(range(1, greatest(length(text) - 15, 1) + 1),
        |    i -> ('0x' || substring(md5(substring(text, i::INT, 16)), 1, 15))::BIGINT)))
        |    AS n_distinct_windows
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Winnow-fingerprint candidate clusters (multi-doc groups only).
    "dedup_winnow_clusters" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    list_min(list_transform(range(1, greatest(length(text) - 15, 1) + 1),
        |      i -> ('0x' || substring(md5(substring(text, i::INT, 16)), 1, 15))::BIGINT))
        |      AS fingerprint_h
        |  FROM documents
        |)
        |SELECT min(doc_id)::BIGINT AS canonical_doc_id, fingerprint_h,
        |  count(*)::BIGINT AS n_docs
        |FROM f GROUP BY fingerprint_h HAVING count(*) >= 2
        |ORDER BY canonical_doc_id""".stripMargin,

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

    // Median/MAD spike census over the per-(type, hour) count series.
    "ext_hourly_spikes" ->
      """WITH c AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |      ORDER BY cnt, h) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM c
        |), m AS (
        |  SELECT *, max(CASE WHEN rn = (n + 1) // 2 THEN cnt END)
        |      OVER (PARTITION BY event_type) AS median_cnt
        |  FROM r
        |), d AS (
        |  SELECT *, abs(cnt - median_cnt) AS dev FROM m
        |), d2 AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |      ORDER BY dev, h) AS rn2
        |  FROM d
        |), md AS (
        |  SELECT *, max(CASE WHEN rn2 = (n + 1) // 2 THEN dev END)
        |      OVER (PARTITION BY event_type) AS mad_cnt
        |  FROM d2
        |)
        |SELECT event_type, max(n)::BIGINT AS n_hours,
        |  max(median_cnt)::BIGINT AS median_cnt,
        |  max(mad_cnt)::BIGINT AS mad_cnt,
        |  CAST(sum(CASE WHEN cnt > median_cnt + mad_cnt * 3
        |               THEN 1 ELSE 0 END) AS BIGINT) AS n_spike_hours,
        |  max(cnt)::BIGINT AS max_cnt
        |FROM md GROUP BY 1 ORDER BY event_type""".stripMargin,

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

    // GPT-3-style exact 13-gram firewall: ANY shared 13-gram with the
    // training split marks the held-out doc contaminated.
    "corpus_firewall13" ->
      """WITH toks13 AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                             x -> x != '') AS t
        |  FROM documents
        |), sh13 AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 11),
        |    i -> md5(array_to_string(t[i:i+12], ' ')))) AS hs
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

    "corpus_contamination" -> (shingles3 +
      """, shx AS (
        |  SELECT doc_id, unnest(sh) AS shingle FROM sh
        |), dfc AS (
        |  SELECT shingle FROM shx GROUP BY shingle HAVING count(*) <= 100
        |), rare AS (
        |  SELECT shx.doc_id, shx.shingle FROM shx JOIN dfc USING (shingle)
        |), shared AS (
        |  SELECT b.doc_id AS bench_doc, t.doc_id AS train_doc,
        |    count(*)::BIGINT AS n_shared
        |  FROM rare b JOIN rare t USING (shingle)
        |  WHERE b.doc_id % 17 = 0 AND t.doc_id % 17 != 0
        |  GROUP BY 1, 2
        |), bn AS (
        |  SELECT doc_id AS bench_doc, count(*)::BIGINT AS bench_n
        |  FROM shx WHERE doc_id % 17 = 0 GROUP BY 1
        |)
        |SELECT s.bench_doc, s.train_doc, s.n_shared,
        |  (s.n_shared * 1000000 // b.bench_n)::BIGINT AS contam_ppm
        |FROM shared s JOIN bn b USING (bench_doc)
        |WHERE s.n_shared >= 2
        |ORDER BY bench_doc, train_doc""".stripMargin),

    "corpus_decontaminated" -> (shingles3 +
      """, shx AS (
        |  SELECT doc_id, unnest(sh) AS shingle FROM sh
        |), dfc AS (
        |  SELECT shingle FROM shx GROUP BY shingle HAVING count(*) <= 100
        |), rare AS (
        |  SELECT shx.doc_id, shx.shingle FROM shx JOIN dfc USING (shingle)
        |), flagged AS (
        |  SELECT DISTINCT t.doc_id
        |  FROM rare b JOIN rare t USING (shingle)
        |  WHERE b.doc_id % 17 = 0 AND t.doc_id % 17 != 0
        |  GROUP BY b.doc_id, t.doc_id HAVING count(*) >= 2
        |)
        |SELECT d.doc_id, d.lang, d.source
        |FROM documents d
        |WHERE d.doc_id % 17 != 0
        |  AND d.doc_id NOT IN (SELECT doc_id FROM flagged)
        |ORDER BY d.doc_id""".stripMargin),

    "dedup_exact" ->
      """SELECT sha256(text) AS content_hash, min(doc_id) AS canonical_doc_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY sha256(text) ORDER BY canonical_doc_id""".stripMargin,

    "dedup_bow" -> (toks +
      """SELECT md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS bow_hash,
        |  min(doc_id) AS canonical_doc_id, count(*) AS n_copies
        |FROM toks GROUP BY 1 ORDER BY canonical_doc_id""".stripMargin),

    "dedup_ngram_pairs" -> (shingles3 +
      """, ex AS (
        |  SELECT doc_id, unnest(sh) AS shingle FROM sh
        |), sizes AS (
        |  SELECT doc_id, len(sh) AS n_sh FROM sh
        |), rare AS (
        |  SELECT doc_id, shingle FROM (
        |    SELECT doc_id, shingle,
        |      count(*) OVER (PARTITION BY shingle) AS df
        |    FROM ex) WHERE df <= 100
        |), pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_rare
        |  FROM rare a JOIN rare b
        |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
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
    "dedup_threshold_hist" -> (shingles3 +
      """, ex AS (
        |  SELECT doc_id, unnest(sh) AS shingle FROM sh
        |), sizes AS (
        |  SELECT doc_id, len(sh) AS n_sh FROM sh
        |), rare AS (
        |  SELECT doc_id, shingle FROM (
        |    SELECT doc_id, shingle,
        |      count(*) OVER (PARTITION BY shingle) AS df
        |    FROM ex) WHERE df <= 100
        |), pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_rare
        |  FROM rare a JOIN rare b
        |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
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

    "dedup_simhash_pairs" -> (simhashSig +
      """, bands AS (
        |  SELECT doc_id, simhash, band,
        |    (simhash >> (band * 15)) & 32767 AS band_val
        |  FROM sig, range(0, 4) r(band)
        |)
        |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  bit_count(xor(a.simhash, b.simhash)) AS hamming
        |FROM bands a JOIN bands b
        |  ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
        |ORDER BY doc_a, doc_b""".stripMargin),

    "dedup_clusters" -> ("WITH RECURSIVE " +
      simhashSig.stripPrefix("WITH ") + simhashCcChain +
      """
        |SELECT doc_id, cluster_id FROM cl ORDER BY doc_id""".stripMargin),

    // Cluster-size histogram over the same CC chain.
    "dedup_cluster_sizes" -> ("WITH RECURSIVE " +
      simhashSig.stripPrefix("WITH ") + simhashCcChain +
      """, cs AS (
        |  SELECT cluster_id, count(*)::BIGINT AS cluster_size
        |  FROM cl GROUP BY 1
        |)
        |SELECT cluster_size, count(*)::BIGINT AS n_clusters,
        |  (cluster_size * count(*))::BIGINT AS n_docs
        |FROM cs GROUP BY 1 ORDER BY cluster_size""".stripMargin),

    // Cluster-size-aware sampling weights: every duplicate cluster
    // contributes ONE document's worth of mass, split across members
    // (weight_ppm = 1e6 // size); per-language effective token mass.
    "corpus_dedup_weights" -> ("WITH RECURSIVE " +
      simhashSig.stripPrefix("WITH ") + simhashCcChain +
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
      simhashSig.stripPrefix("WITH ") + simhashCcChain +
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

    // Canonical-by-quality: the dedup_clusters chain + the corpus_clean
    // gate; survivor = keep-first, longest, then lowest id.
    "dedup_canonical" -> ("WITH RECURSIVE " +
      simhashSig.stripPrefix("WITH ") + simhashCcChain +
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
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
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

    // Twin of the streaming LSH dedup: the same banded MinHash pipeline,
    // but pairs keep the agreeing BAND (the stream emits one row per
    // agreeing band) instead of collapsing to distinct pairs.
    "stream_dedup_batch" -> (shingles3 +
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
        |), cand AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.band AS band
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        |), est AS (
        |  SELECT doc_a, doc_b, band,
        |    CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) * 1000000 // 16
        |         AS BIGINT) AS est_jaccard_ppm
        |  FROM cand
        |  JOIN sig sa ON sa.doc_id = doc_a
        |  JOIN sig sb ON sb.doc_id = doc_b AND sb.i = sa.i
        |  GROUP BY 1, 2, 3
        |)
        |SELECT doc_a, doc_b, band, est_jaccard_ppm FROM est
        |WHERE est_jaccard_ppm >= 250000
        |ORDER BY doc_a, doc_b, band""".stripMargin),

    // LSH index QA: recall/precision of the banded MinHash candidates vs
    // exact blocked Jaccard >= 0.5 — both sides are the pipelines of
    // dedup_ngram_pairs / dedup_minhash_pairs above, CTEs renamed apart.
    "dedup_minhash_recall" -> (shingles3 +
      """, gex AS (
        |  SELECT doc_id, unnest(sh) AS shingle FROM sh
        |), gsizes AS (
        |  SELECT doc_id, len(sh) AS n_sh FROM sh
        |), grare AS (
        |  SELECT doc_id, shingle FROM (
        |    SELECT doc_id, shingle,
        |      count(*) OVER (PARTITION BY shingle) AS df
        |    FROM gex) WHERE df <= 100
        |), gpairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_rare
        |  FROM grare a JOIN grare b
        |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
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
        |), mcand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM mbands a JOIN mbands b
        |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
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

    // SemDeDup shape: connected components over the SRP cosine pair
    // graph; canonical member = the one equal to its (min-id) label.
    "dedup_semantic_clusters" -> ("WITH RECURSIVE " +
      quantized.stripPrefix("WITH ") + srpPairChain +
      """, rr(x, m) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT e.db, rr.m FROM rr JOIN
        |    (SELECT va AS da, vb AS db FROM sprs
        |     UNION ALL SELECT vb, va FROM sprs) e ON e.da = rr.x
        |), cl AS (
        |  SELECT x AS vec_id, min(m) AS cluster_id FROM rr GROUP BY x
        |)
        |SELECT vec_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
        |  vec_id = cluster_id AS keep
        |FROM cl ORDER BY vec_id""".stripMargin),

    "ann_bruteforce" -> (quantized +
      """, d AS (
        |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
        |    CAST(sum(q.q * v.q) AS BIGINT) AS dot
        |  FROM v q JOIN v ON q.i = v.i AND q.vec_id % 50 = 0
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
    // fused by integer reciprocal rank 1e6 // (60 + rank).
    "ann_hybrid_rrf" -> (quantized +
      """, d AS (
        |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
        |    CAST(sum(q.q * v.q) AS BIGINT) AS dot
        |  FROM v q JOIN v ON q.i = v.i AND q.vec_id % 50 = 0
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
        |  SELECT doc_id, t[p+1] || ' ' || t[p+2] AS term
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
        |    AND q.doc_id % 50 = 0 AND p.doc_id != q.doc_id
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
    // probe widths — each block reuses the shared chain.
    "ann_nprobe_sweep" -> (kmeansFin +
      """, bfd AS (
        |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
        |    CAST(sum(q.q * v.q) AS BIGINT) AS dot
        |  FROM v q JOIN v ON q.i = v.i AND q.vec_id % 50 = 0
        |                 AND v.vec_id != q.vec_id
        |  GROUP BY 1, 2
        |), bf AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      row_number() OVER (PARTITION BY query_id
        |                         ORDER BY dot DESC, neighbor_id) AS rank
        |    FROM bfd) WHERE rank <= 10
        |), tot AS (
        |  SELECT count(*)::BIGINT AS n_true,
        |    count(DISTINCT query_id)::BIGINT AS n_queries
        |  FROM bf
        |)""".stripMargin +
      Seq(1, 2, 4, 8).map(nprobeBlock).mkString +
      """
        |SELECT nprobe, n_queries, n_true, n_overlap,
        |  CAST(n_overlap * 1000000 // n_true AS BIGINT) AS recall_ppm
        |FROM (SELECT * FROM row1 UNION ALL SELECT * FROM row2
        |      UNION ALL SELECT * FROM row4 UNION ALL SELECT * FROM row8)
        |ORDER BY nprobe""".stripMargin),

    // Cell-population / distortion audit over the SAME trained index.
    "ann_cell_balance" -> (kmeansFin +
      """SELECT cell_id, count(*)::BIGINT AS n_vectors,
        |  CAST(count(*) * 1000000 // sum(count(*)) OVER () AS BIGINT)
        |    AS share_ppm,
        |  CAST(sum(dist) AS BIGINT) AS sum_dist,
        |  max(dist)::BIGINT AS max_dist
        |FROM fin GROUP BY 1 ORDER BY cell_id""".stripMargin),

    // ann_index_update: kmeans trains on the BASE slice only (seeds +
    // 4 of 5 remaining ids), the held-out batch assigns to the frozen
    // final centroids (c1), and the census full-outer-joins both sides.
    "ann_index_update" -> (quantized +
      """, vb AS (
        |  SELECT * FROM v WHERE vec_id < 16 OR vec_id % 5 != 4
        |), vn AS (
        |  SELECT * FROM v WHERE vec_id >= 16 AND vec_id % 5 = 4
        |), c0 AS (
        |  SELECT vec_id AS cell_id, i, q AS c FROM vb WHERE vec_id < 16
        |), d1 AS (
        |  SELECT vb.vec_id, c.cell_id,
        |    CAST(sum((vb.q - c.c) * (vb.q - c.c)) AS BIGINT) AS dist
        |  FROM vb JOIN c0 c ON vb.i = c.i GROUP BY 1, 2
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
      """, c0 AS (
        |  SELECT vec_id AS cell_id, i, q AS c FROM v WHERE vec_id < 16
        |), d1 AS (
        |  SELECT v.vec_id, c.cell_id,
        |    CAST(sum((v.q - c.c) * (v.q - c.c)) AS BIGINT) AS dist
        |  FROM v JOIN c0 c ON v.i = c.i GROUP BY 1, 2
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
        |    FROM d2 WHERE vec_id % 50 = 0) WHERE crank <= 4
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
      """, sc AS (
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
      """SELECT i - 1 AS dim, count(*)::BIGINT AS n_vecs,
        |  min(q)::BIGINT AS min_q, max(q)::BIGINT AS max_q,
        |  sum(q)::BIGINT AS sum_q,
        |  CAST(sum(CASE WHEN q = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |  (sum(q) // count(*))::BIGINT AS mean_q
        |FROM v GROUP BY 1 ORDER BY dim""".stripMargin),

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
    "text_tfidf_topk" -> (toks +
      """, tt AS (
        |  SELECT doc_id, t[p+1] || ' ' || t[p+2] AS term
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
        |    AND q.doc_id % 50 = 0 AND p.doc_id != q.doc_id
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
      """WITH t0 AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
        |                             x -> x != '') AS t
        |  FROM documents WHERE doc_id % 50 != 0
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
        |    lower(ctoks[p+1]) || ' ' || lower(ctoks[p+2]) AS term
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
        |  FROM documents WHERE doc_id % 50 = 0
        |), qtt AS (
        |  SELECT query_id, t[p+1] || ' ' || t[p+2] AS term
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
      """WITH t0 AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
        |                             x -> x != '') AS t
        |  FROM documents WHERE doc_id % 50 != 0
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
        |    lower(ctoks[p+1]) || ' ' || lower(ctoks[p+2]) AS term
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
        |  FROM documents WHERE doc_id % 50 = 0
        |), qtt AS (
        |  SELECT query_id, t[p+1] || ' ' || t[p+2] AS term
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

    "ann_label_centroids" -> (quantized +
      """, cent AS (
        |  SELECT label, i,
        |    CAST(floor(sum(q) * 1000.0 / count(*)) AS BIGINT) AS c
        |  FROM v GROUP BY label, i
        |)
        |SELECT a.label AS label_a, b.label AS label_b,
        |  CAST(sum(a.c * b.c) AS BIGINT) AS dot
        |FROM cent a JOIN cent b ON a.i = b.i AND a.label < b.label
        |GROUP BY 1, 2 ORDER BY label_a, label_b""".stripMargin),

    "mm_features" -> (media +
      """SELECT m.doc_id, format, width, height, n_frames,
        |  CAST(n_bytes AS BIGINT) AS n_bytes, first_byte, frame_byte_sum
        |FROM m JOIN fr ON m.doc_id = fr.doc_id ORDER BY m.doc_id""".stripMargin),

    "mm_resized" -> (media +
      """, rz AS (
        |  SELECT doc_id, format, n_bytes, hx,
        |    greatest(1, (width * 64) // greatest(width, height)) AS out_w,
        |    greatest(1, (height * 64) // greatest(width, height)) AS out_h
        |  FROM m
        |), g AS (
        |  SELECT doc_id,
        |    CAST(sum(coalesce(try_cast('0x' || substring(hx,
        |      greatest(least((i * n_bytes) // (out_w * out_h), n_bytes - 1), 0)
        |        * 2 + 1, 2) AS INT), 0))
        |      AS BIGINT) AS grid_byte_sum
        |  FROM rz, range(0, 4096) t(i) WHERE i < out_w * out_h
        |  GROUP BY doc_id
        |)
        |SELECT rz.doc_id, format, out_w, out_h, grid_byte_sum
        |FROM rz JOIN g ON rz.doc_id = g.doc_id ORDER BY rz.doc_id""".stripMargin),

    // Exact payload-dup census: 60-bit sha2 prefix + byte length key,
    // matching the engine's hashes-not-bodies shuffle key exactly.
    "mm_dupes" ->
      """WITH m AS (
        |  SELECT ['jpeg','png','wav','mp4'][(doc_id % 4 + 1)::INT] AS format,
        |    octet_length(encode(text))::BIGINT AS n_bytes,
        |    try_cast('0x' || substring(sha256(text), 1, 15) AS BIGINT) AS h
        |  FROM documents
        |), g AS (
        |  SELECT format, h, n_bytes, count(*)::BIGINT AS clones
        |  FROM m GROUP BY 1, 2, 3
        |)
        |SELECT format, count(*)::BIGINT AS n_payloads,
        |  sum(clones)::BIGINT AS n_media,
        |  sum(clones - 1)::BIGINT AS n_dup_items,
        |  max(clones)::BIGINT AS max_clones,
        |  CAST(sum((clones - 1) * n_bytes) AS BIGINT) AS wasted_bytes
        |FROM g GROUP BY 1 ORDER BY format""".stripMargin,

    // Count-of-counts skew census, one block per lineitem join key.
    "ext_key_skew" -> Seq("l_orderkey", "l_partkey", "l_suppkey")
      .map(keySkewOracle)
      .mkString("", "\nUNION ALL\n", "\nORDER BY key_name"),

    "mm_format_rollup" -> (media +
      """SELECT format, count(*) AS n_media,
        |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(sum(frame_byte_sum) AS BIGINT) AS sum_frame_bytes
        |FROM m JOIN fr ON m.doc_id = fr.doc_id
        |GROUP BY format ORDER BY format""".stripMargin),

    // ann_ivf IS exactly oracle-able despite being "approximate" ANN: the
    // whole pipeline (centroid pick, assignment argmax, probe ranking,
    // candidate ranking) is deterministic integer math with explicit
    // tie-breaks, so DuckDB reproduces it bit-for-bit.
    "ann_ivf" -> (quantized +
      """, cent AS (
        |  SELECT vec_id AS cell_id, i, q AS cq FROM v WHERE vec_id < 16
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
        |    FROM adot WHERE vec_id % 50 = 0) WHERE crank <= 4
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

    // Order-to-ship day lag percentiles off the count-of-counts census.
    "ext_fulfillment_lag" ->
      """WITH f AS (
        |  SELECT o_orderpriority,
        |    datediff('day', o_orderdate::DATE, l_shipdate::DATE)::BIGINT
        |      AS lag_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |), q AS (
        |  SELECT o_orderpriority, lag_days, count(*)::BIGINT AS cnt
        |  FROM f GROUP BY 1, 2
        |), w AS (
        |  SELECT o_orderpriority, lag_days, cnt,
        |    sum(cnt) OVER (PARTITION BY o_orderpriority ORDER BY lag_days
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(cnt) OVER (PARTITION BY o_orderpriority) AS n_lines,
        |    min(lag_days) OVER (PARTITION BY o_orderpriority) AS min_lag,
        |    max(lag_days) OVER (PARTITION BY o_orderpriority) AS max_lag
        |  FROM q
        |)
        |SELECT o_orderpriority, CAST(n_lines AS BIGINT) AS n_lines,
        |  min_lag,
        |  min(CASE WHEN cum >= (n_lines + 1) // 2 THEN lag_days END)::BIGINT
        |    AS p50_lag,
        |  min(CASE WHEN cum >= (n_lines * 99 + 99) // 100 THEN lag_days
        |      END)::BIGINT AS p99_lag,
        |  max_lag
        |FROM w GROUP BY o_orderpriority, n_lines, min_lag, max_lag
        |ORDER BY o_orderpriority""".stripMargin,

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

    "ext_funnel" ->
      (eventsE + """, f1 AS (
        |  SELECT user_id, event_type, tsu,
        |    min(CASE WHEN event_type = 'view' THEN tsu END)
        |      OVER (PARTITION BY user_id) AS s1_us
        |  FROM e
        |), f2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND tsu > s1_us
        |                     THEN tsu END)
        |      OVER (PARTITION BY user_id) AS s2_us
        |  FROM f1
        |), f3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND tsu > s2_us
        |                     THEN tsu END)
        |      OVER (PARTITION BY user_id) AS s3_us
        |  FROM f2
        |)
        |SELECT DISTINCT user_id, s1_us, s2_us, s3_us,
        |  (CASE WHEN s3_us IS NOT NULL THEN 3
        |        WHEN s2_us IS NOT NULL THEN 2
        |        WHEN s1_us IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS depth
        |FROM f3 ORDER BY user_id""".stripMargin),

    "ext_cms_hitters" ->
      """WITH ei AS (
        |  SELECT user_id, unnest(range(0, 4)) AS i FROM events
        |), hb AS (
        |  SELECT user_id, i,
        |    ('0x' || substring(md5(i || ':' || user_id), 1, 8))::BIGINT % 64 AS b
        |  FROM ei
        |), sk AS (
        |  SELECT i, b, count(*)::BIGINT AS c FROM hb GROUP BY 1, 2
        |), ex AS (
        |  SELECT user_id, count(*)::BIGINT AS exact_cnt FROM events GROUP BY 1
        |), qb AS (
        |  SELECT DISTINCT user_id, i, b FROM hb
        |), est AS (
        |  SELECT qb.user_id, min(sk.c)::BIGINT AS cms_est
        |  FROM qb JOIN sk USING (i, b) GROUP BY 1
        |)
        |SELECT ex.user_id, ex.exact_cnt, est.cms_est,
        |  (est.cms_est - ex.exact_cnt)::BIGINT AS overcount
        |FROM ex JOIN est USING (user_id) ORDER BY user_id""".stripMargin,

    "ext_type_pivot" ->
      """SELECT user_id,
        |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click,
        |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS "error",
        |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
        |  sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup,
        |  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS "view",
        |  count(*)::BIGINT AS total
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "ext_exact_percentiles" ->
      (eventsE + """, r AS (
        |  SELECT event_type, value_c,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY value_c, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM e
        |)
        |SELECT event_type, n::BIGINT AS n_events,
        |  min(CASE WHEN rn = (n + 1) // 2 THEN value_c END) AS median_c,
        |  min(CASE WHEN rn = (n * 9 + 9) // 10 THEN value_c END) AS p90_c
        |FROM r
        |WHERE rn = (n + 1) // 2 OR rn = (n * 9 + 9) // 10
        |GROUP BY event_type, n ORDER BY event_type""".stripMargin),

    // Exact median / MAD / 3-MAD outlier census per event type — both
    // medians as rank-selected window VALUES (no join-back), matching
    // the engine's one-exchange plan.
    "ext_mad_outliers" ->
      (eventsE + """, r AS (
        |  SELECT event_type, event_id, value_c,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY value_c, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM e
        |), m AS (
        |  SELECT event_type, event_id, value_c, n,
        |    max(CASE WHEN rn = (n + 1) // 2 THEN value_c END)
        |      OVER (PARTITION BY event_type) AS median_c
        |  FROM r
        |), d AS (
        |  SELECT event_type, event_id, n, median_c,
        |    abs(value_c - median_c) AS dev,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY abs(value_c - median_c), event_id) AS rn2
        |  FROM m
        |), dm AS (
        |  SELECT event_type, n, median_c, dev,
        |    max(CASE WHEN rn2 = (n + 1) // 2 THEN dev END)
        |      OVER (PARTITION BY event_type) AS mad_c
        |  FROM d
        |)
        |SELECT event_type, max(n)::BIGINT AS n_events,
        |  max(median_c) AS median_c, max(mad_c) AS mad_c,
        |  CAST(sum(CASE WHEN dev > mad_c * 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM dm GROUP BY event_type ORDER BY event_type""".stripMargin),

    "ext_retention" ->
      (eventsE + """, c AS (
        |  SELECT user_id, day,
        |    min(day) OVER (PARTITION BY user_id) AS cohort_day
        |  FROM e
        |), d AS (
        |  SELECT DISTINCT user_id, cohort_day, day - cohort_day AS day_offset
        |  FROM c
        |)
        |SELECT cohort_day, day_offset, count(*)::BIGINT AS n_active_users
        |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // PQ: the subspace k-means replay is the ann_kmeans chain with (m, j)
    // = ((i-1)//8, (i-1)%8) extending every group key; cb1 is the
    // codebook after the single recompute (iters=2 assigns against it).
    "ann_pq_codes" -> (quantized + pqChain +
      """SELECT vec_id, m::BIGINT AS m, code::BIGINT AS code
        |FROM a2 ORDER BY vec_id, m""".stripMargin),

    // PQ codebook staleness: trained on even ids only (initial centroids
    // = first 16 even ids), frozen, then distortion per (half, subspace).
    "ann_pq_drift" -> (quantized +
      """, sv AS (
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
      """, qs AS (
        |  SELECT vec_id AS query_id, m, j, q FROM sv WHERE vec_id % 50 = 0
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
      """SELECT query_id, rank, neighbor_id, dot, adc_dot FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY dot DESC, neighbor_id)::INT AS rank
        |  FROM ex)
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin),

    // Recall@10 of the composed index vs the exact baseline (same
    // comparison tail as ann_pq_recall).
    "ann_ivfpq_recall" -> (quantized + pqChain + ivfPqChain +
      """, ivfpq10 AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY dot DESC, neighbor_id) AS rnk
        |    FROM ex) WHERE rnk <= 10
        |), bd AS (
        |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
        |    CAST(sum(q.q * v.q) AS BIGINT) AS dot
        |  FROM v q JOIN v ON q.i = v.i AND q.vec_id % 50 = 0
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
      """, qs AS (
        |  SELECT vec_id AS query_id, m, j, q FROM sv WHERE vec_id % 50 = 0
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

    "dedup_containment" -> (shingles3 +
      """, ex AS (
        |  SELECT doc_id, unnest(sh) AS shingle FROM sh
        |), sizes AS (
        |  SELECT doc_id, len(sh) AS n_sh FROM sh
        |), rare AS (
        |  SELECT doc_id, shingle FROM (
        |    SELECT doc_id, shingle,
        |      count(*) OVER (PARTITION BY shingle) AS df
        |    FROM ex) WHERE df <= 100
        |), pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_rare
        |  FROM rare a JOIN rare b
        |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
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

    "layout_zorder" ->
      s"""WITH z AS (
         |  SELECT l_partkey::BIGINT AS x, l_suppkey::BIGINT AS y,
         |    ${graft.engine.ingest.Layout.zValueSql("l_partkey::BIGINT", "l_suppkey::BIGINT")} AS z
         |  FROM lineitem
         |)
         |SELECT z >> 16 AS z_bucket, count(*)::BIGINT AS n_rows,
         |  min(x) AS x_min, max(x) AS x_max,
         |  min(y) AS y_min, max(y) AS y_max,
         |  max(x) - min(x) AS x_span, max(y) - min(y) AS y_span
         |FROM z GROUP BY 1 ORDER BY z_bucket""".stripMargin,

    "ann_srp_topk" -> (quantized +
      """, c AS (
        |  SELECT p, i,
        |    CASE WHEN ('0x' || substring(md5(p || '_' || i), 1, 1))::INT % 2 = 1
        |         THEN 1 ELSE -1 END AS cc
        |  FROM range(0, 16) r(p), range(1, 65) s(i)
        |), sigv AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END)
        |         AS BIGINT) AS sg
        |  FROM (SELECT vec_id, p, sum(q * cc) AS proj
        |        FROM v JOIN c ON v.i = c.i GROUP BY 1, 2)
        |  GROUP BY vec_id
        |), bands AS (
        |  SELECT vec_id, band, (sg >> (band * 4)) & 15 AS bv
        |  FROM sigv, range(0, 4) r(band)
        |), cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
        |  FROM bands q JOIN bands n ON q.band = n.band AND q.bv = n.bv
        |  WHERE q.vec_id % 50 = 0 AND n.vec_id != q.vec_id
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
      """, d AS (
        |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
        |    CAST(sum(q.q * v.q) AS BIGINT) AS dot
        |  FROM v q JOIN v ON q.i = v.i AND q.vec_id % 50 = 0
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
        |  FROM range(0, 16) r(p), range(1, 65) s(i)
        |), sigv AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END)
        |         AS BIGINT) AS sg
        |  FROM (SELECT vec_id, p, sum(q * cc) AS proj
        |        FROM v JOIN c ON v.i = c.i GROUP BY 1, 2)
        |  GROUP BY vec_id
        |), bands AS (
        |  SELECT vec_id, band, (sg >> (band * 4)) & 15 AS bv
        |  FROM sigv, range(0, 4) r(band)
        |), cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
        |  FROM bands q JOIN bands n ON q.band = n.band AND q.bv = n.bv
        |  WHERE q.vec_id % 50 = 0 AND n.vec_id != q.vec_id
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

    "ext_q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS sum_qty_c,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS sum_base_price_c,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
        |           (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
        |       AS BIGINT) AS sum_disc_price_bp,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
        |           (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) *
        |           (100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT)))
        |       AS BIGINT) AS sum_charge_mp,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_extendedprice), 2) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*)::BIGINT AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Q21 shape: EXISTS (another supplier) + NOT EXISTS (another LATE
    // supplier) on the same fact; one blame row per (order, supplier).
    "ext_q21_sole_late" ->
      """WITH late AS (
        |  SELECT DISTINCT l.l_orderkey, l.l_suppkey
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderstatus = 'F'
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        |), blamed AS (
        |  SELECT t.l_orderkey, t.l_suppkey FROM late t
        |  WHERE EXISTS (
        |    SELECT 1 FROM lineitem x
        |    WHERE x.l_orderkey = t.l_orderkey AND x.l_suppkey != t.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM late y
        |    WHERE y.l_orderkey = t.l_orderkey AND y.l_suppkey != t.l_suppkey)
        |)
        |SELECT s.s_name, count(*)::BIGINT AS numwait
        |FROM blamed b JOIN supplier s ON b.l_suppkey = s.s_suppkey
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s.s_name LIMIT 100""".stripMargin,

    // Q22 shape: uncorrelated scalar-subquery average gate (exact, by
    // cross-multiplication) + NOT EXISTS anti join, per-nation census.
    "ext_q22_idle_rich" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
        |  FROM customer
        |)
        |SELECT c_nationkey, count(*)::BIGINT AS n_custs,
        |  CAST(sum(bal_c) AS BIGINT) AS total_bal_c
        |FROM c
        |WHERE bal_c * (SELECT count(*) FROM c WHERE bal_c > 0)
        |        > (SELECT sum(bal_c) FROM c WHERE bal_c > 0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    // Q15 shape: per-supplier quarterly revenue, rows selected by the
    // scalar-subquery MAX (ties surface; no sort-limit).
    "ext_q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
        |             (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
        |         AS BIGINT) AS total_rev_bp
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate < TIMESTAMP '1995-04-01'
        |  GROUP BY 1
        |)
        |SELECT s.s_suppkey, s.s_name, r.total_rev_bp
        |FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
        |WHERE r.total_rev_bp = (SELECT max(total_rev_bp) FROM rev)
        |ORDER BY s.s_suppkey""".stripMargin,

    // Q20 shape: per-(part, supplier) 1995 quantity, per-part total via a
    // window over the aggregate, exact 20% share gate (qty·5 > total).
    "ext_q20_dominant_suppliers" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
        |         AS BIGINT) AS supp_qty_c
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-01-01'
        |  GROUP BY 1, 2
        |), dom AS (
        |  SELECT l_suppkey, supp_qty_c
        |  FROM (SELECT l_suppkey, supp_qty_c,
        |          sum(supp_qty_c) OVER (PARTITION BY l_partkey) AS part_qty_c
        |        FROM ps)
        |  WHERE supp_qty_c * 5 > part_qty_c
        |)
        |SELECT s.s_suppkey, s.s_name,
        |  count(*)::BIGINT AS n_dominant_parts,
        |  CAST(sum(d.supp_qty_c) AS BIGINT) AS dominant_qty_c
        |FROM dom d JOIN supplier s ON d.l_suppkey = s.s_suppkey
        |GROUP BY 1, 2
        |ORDER BY n_dominant_parts DESC, s.s_suppkey""".stripMargin,

    // Q5 shape: six-table join, supplier constrained to the customer's
    // own nation (the dual-role nation equality).
    "ext_q5_local_revenue" ->
      """SELECT n.n_name,
        |  CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) *
        |           (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
        |       AS BIGINT) AS revenue_bp,
        |  count(*)::BIGINT AS n_lines
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |              AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY revenue_bp DESC, n_name""".stripMargin,

    // Q2 shape: cheapest-offer supplier per STANDARD part among EUROPE
    // suppliers; offer = min lineitem price per (part, supplier).
    "ext_q2_min_cost" ->
      """WITH sup AS (
        |  SELECT s.s_suppkey, s.s_name, n.n_name,
        |    CAST(floor(s.s_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_c
        |  FROM supplier s
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  WHERE r.r_name = 'EUROPE'
        |), offers AS (
        |  SELECT p.p_partkey, p.p_brand, p.p_size,
        |    s.s_suppkey, s.s_name, s.n_name, s.acctbal_c,
        |    CAST(min(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
        |         AS BIGINT) AS min_offer_c
        |  FROM lineitem l
        |  JOIN sup s ON l.l_suppkey = s.s_suppkey
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_type = 'STANDARD'
        |  GROUP BY 1, 2, 3, 4, 5, 6, 7
        |)
        |SELECT acctbal_c, s_name, n_name, p_partkey, p_brand, p_size,
        |       min_offer_c
        |FROM (SELECT *,
        |        min(min_offer_c) OVER (PARTITION BY p_partkey) AS part_min_c
        |      FROM offers)
        |WHERE min_offer_c = part_min_c
        |ORDER BY acctbal_c DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    // Q13 shape: order-count histogram over ALL customers (zero-order
    // customers included), non-LOW priority orders only.
    "ext_q13_order_counts" ->
      """WITH pc AS (
        |  SELECT o_custkey, count(*)::BIGINT AS cnt
        |  FROM orders WHERE o_orderpriority <> '5-LOW' GROUP BY 1
        |)
        |SELECT coalesce(pc.cnt, 0)::BIGINT AS c_count,
        |       count(*)::BIGINT AS custdist
        |FROM customer c LEFT JOIN pc ON c.c_custkey = pc.o_custkey
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,

    // Q14 shape: promo revenue share as exact integer ppm.
    "ext_q14_promo_share" ->
      """WITH m AS (
        |  SELECT (p.p_type = 'PROMO') AS is_promo,
        |    CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) *
        |      (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)) AS rev_bp
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
        |    AND l.l_shipdate < TIMESTAMP '1996-04-01'
        |)
        |SELECT
        |  CAST(sum(CASE WHEN is_promo THEN rev_bp ELSE 0 END) AS BIGINT)
        |    AS promo_rev_bp,
        |  CAST(sum(rev_bp) AS BIGINT) AS total_rev_bp,
        |  CAST(sum(CASE WHEN is_promo THEN rev_bp ELSE 0 END) * 1000000
        |       // sum(rev_bp) AS BIGINT) AS promo_ppm
        |FROM m""".stripMargin,

    // Q19 shape: OR of three (brand, size, qty) conjunction groups.
    "ext_q19_disjunctive" ->
      """SELECT
        |  CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) *
        |           (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
        |       AS BIGINT) AS revenue_bp,
        |  count(*)::BIGINT AS n_lines
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
        |       AND l.l_quantity BETWEEN 1 AND 11)
        |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
        |       AND l.l_quantity BETWEEN 10 AND 20)
        |   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
        |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin,

    // Q7 shape: bilateral nation-pair revenue by flow direction and
    // ship year — the disjunction spans two dimension roles.
    "ext_q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l.l_shipdate)::INT AS l_year,
        |  CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) *
        |           (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
        |       AS BIGINT) AS revenue_bp,
        |  count(*)::BIGINT AS n_lines
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        |   OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // Q16 shape: distinct suppliers per surviving part class, denylist
    // (negative balance) excluded via anti join.
    "ext_q16_supplier_variety" ->
      """SELECT p.p_brand, p.p_type, p.p_size,
        |  count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_brand <> 'Brand#45' AND p.p_type <> 'PROMO'
        |  AND p.p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
        |  AND l.l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

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

    // Q9 shape: product-line (LIKE-pruned) profit by supplier nation
    // and order year.
    "ext_q9_product_profit" ->
      """SELECT n.n_name, year(o.o_orderdate)::INT AS o_year,
        |  CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) *
        |           (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
        |       AS BIGINT) AS revenue_bp,
        |  count(*)::BIGINT AS n_lines
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE p.p_name LIKE '%gear%'
        |GROUP BY 1, 2 ORDER BY n_name, o_year DESC""".stripMargin,

    // Q8 shape: one nation's share of one region's product-line revenue
    // per order year, exact integer ppm.
    "ext_q8_market_share" ->
      """WITH base AS (
        |  SELECT year(o.o_orderdate)::INT AS o_year, n1.n_name AS supp_nation,
        |    CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) *
        |      (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)) AS rev_bp
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE p.p_name LIKE '%gear%'
        |    AND o.o_custkey IN (
        |      SELECT c.c_custkey FROM customer c
        |      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |      JOIN region r ON n2.n_regionkey = r.r_regionkey
        |      WHERE r.r_name = 'ASIA')
        |)
        |SELECT o_year,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_bp
        |                ELSE 0 END) AS BIGINT) AS nation_rev_bp,
        |  CAST(sum(rev_bp) AS BIGINT) AS total_rev_bp,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_bp
        |                ELSE 0 END) * 1000000 // sum(rev_bp) AS BIGINT)
        |    AS share_ppm
        |FROM base GROUP BY 1 ORDER BY o_year""".stripMargin,

    // Q11 shape: per-part value from one nation's suppliers, HAVING
    // against a global scalar — kept when value > 2 × the mean part
    // value (exact integer cross-multiplication, scale-stable gate).
    "ext_q11_important_parts" ->
      """WITH pp AS (
        |  SELECT l.l_partkey,
        |    CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
        |         AS BIGINT) AS value_c
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  WHERE n.n_name = 'NATION_3'
        |  GROUP BY 1
        |)
        |SELECT l_partkey AS p_partkey, value_c
        |FROM pp
        |WHERE value_c * (SELECT count(*) FROM pp)
        |      > (SELECT sum(value_c) FROM pp) * 2
        |ORDER BY value_c DESC, p_partkey""".stripMargin,

    // Q6 shape: single-scan range-predicate revenue, discount band in
    // integer cents, no join.
    "ext_q6_forecast" ->
      """SELECT
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
        |           CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
        |       AS BIGINT) AS revenue_bp,
        |  count(*)::BIGINT AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_quantity < 24
        |  AND CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
        |      BETWEEN 5 AND 7""".stripMargin,

    // Q10 shape: returned-item revenue per customer for one quarter,
    // top 20 by revenue cost.
    "ext_q10_returned_items" ->
      """SELECT c.c_custkey, c.c_name,
        |  CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_c,
        |  n.n_name,
        |  CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) *
        |           (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
        |       AS BIGINT) AS revenue_bp,
        |  count(*)::BIGINT AS n_lines
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE l.l_returnflag = 'R'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue_bp DESC, c_custkey LIMIT 20""".stripMargin,

    // Q12 shape: join + pivoted CASE-WHEN split counts per class
    // (returnflag stands in for the schema's absent shipmode).
    "ext_q12_priority_lines" ->
      """SELECT l.l_returnflag,
        |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_lines,
        |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 0 ELSE 1 END) AS BIGINT) AS low_lines
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l.l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "ext_q4_late_priorities" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders o
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "ext_range_frame_revenue" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |    date_diff('day', TIMESTAMP '1970-01-01', o_orderdate)::INT AS day,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
        |  FROM orders
        |)
        |SELECT o_orderkey, o_custkey, day,
        |  CAST(sum(price_c) OVER w AS BIGINT) AS nearby_revenue_c,
        |  CAST(count(*) OVER w AS BIGINT) AS n_nearby
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day
        |             RANGE BETWEEN 30 PRECEDING AND 30 FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,

    "mm_phash_pairs" -> (media +
      """, pb AS (
        |  SELECT doc_id, i,
        |    coalesce(try_cast('0x' || substring(hx,
        |      greatest(least((i * n_bytes) // 60, n_bytes - 1), 0)::INT * 2 + 1,
        |      2) AS INT), 0) AS b
        |  FROM m, range(0, 60) t(i)
        |), mn AS (
        |  SELECT doc_id, sum(b) // 60 AS mean FROM pb GROUP BY 1
        |), psig AS (
        |  SELECT pb.doc_id,
        |    CAST(sum(CASE WHEN b > mean THEN (1::BIGINT << i) ELSE 0 END)
        |         AS BIGINT) AS phash
        |  FROM pb JOIN mn USING (doc_id) GROUP BY 1
        |), pbands AS (
        |  SELECT doc_id, phash, band, (phash >> (band * 15)) & 32767 AS band_val
        |  FROM psig, range(0, 4) r(band)
        |)
        |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  bit_count(xor(a.phash, b.phash)) AS hamming
        |FROM pbands a JOIN pbands b
        |  ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.phash, b.phash)) <= 8
        |ORDER BY doc_a, doc_b""".stripMargin),

    "ext_q17_small_qty" ->
      """SELECT count(*) AS n_small_lines,
        |  CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
        |       AS BIGINT) AS revenue_c
        |FROM lineitem l
        |WHERE CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT) * 5 <
        |  (SELECT avg(CAST(floor(i.l_quantity * 100 + 0.5) AS BIGINT))
        |   FROM lineitem i WHERE i.l_partkey = l.l_partkey)""".stripMargin,

    "ext_q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS sum_qty_c
        |  FROM lineitem GROUP BY 1
        |  HAVING sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) > 12000
        |)
        |SELECT c_custkey, c_name, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_price_c,
        |  sum_qty_c
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_price_c DESC, o_orderkey LIMIT 20""".stripMargin,

    "corpus_epoch_order" ->
      """SELECT doc_id, epoch,
        |  ('0x' || substring(md5(epoch || ':' || doc_id), 1, 15))::BIGINT
        |    AS order_key
        |FROM documents, range(0, 3) t(epoch)
        |ORDER BY epoch, order_key, doc_id""".stripMargin,

    "dedup_pagerank" -> (simhashSig +
      """, bnd AS (
        |  SELECT doc_id, simhash, band, (simhash >> (band * 15)) & 32767 AS band_val
        |  FROM sig, range(0, 4) r(band)
        |), pr AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bnd a JOIN bnd b
        |    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pr
        |  UNION ALL
        |  SELECT doc_b AS src, doc_a AS dst FROM pr
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

    "ext_q3_unshipped" ->
      """SELECT l_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |  o_orderpriority,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
        |           (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
        |       AS BIGINT) AS revenue_bp
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_bp DESC, l_orderkey LIMIT 10""".stripMargin,

    "ext_scd2" ->
      """WITH o AS (
        |  SELECT c_custkey::BIGINT AS key, c_mktsegment AS old_seg FROM customer
        |), n AS (
        |  SELECT c_custkey::BIGINT AS key,
        |    CASE WHEN c_custkey % 7 = 0 THEN 'NEW-' || c_mktsegment
        |         ELSE c_mktsegment END AS new_seg
        |  FROM customer WHERE c_custkey % 13 != 0
        |), j AS (
        |  SELECT coalesce(o.key, n.key) AS key, old_seg, new_seg
        |  FROM o FULL JOIN n ON o.key = n.key
        |)
        |SELECT key, seg, version, is_current FROM (
        |  SELECT key, old_seg AS seg, 1::BIGINT AS version, false AS is_current
        |  FROM j
        |  WHERE old_seg IS NOT NULL AND (new_seg IS NULL OR new_seg != old_seg)
        |  UNION ALL
        |  SELECT key, old_seg, 1::BIGINT, true FROM j WHERE new_seg = old_seg
        |  UNION ALL
        |  SELECT key, new_seg,
        |    (CASE WHEN old_seg IS NOT NULL THEN 2 ELSE 1 END)::BIGINT, true
        |  FROM j
        |  WHERE new_seg IS NOT NULL AND (old_seg IS NULL OR new_seg != old_seg)
        |) ORDER BY key, version""".stripMargin,

    "ann_pq_recall" -> (quantized + pqChain +
      """, qs AS (
        |  SELECT vec_id AS query_id, m, j, q FROM sv WHERE vec_id % 50 = 0
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
        |  FROM v q JOIN v ON q.i = v.i AND q.vec_id % 50 = 0
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

    "text_novelty" -> (toks +
      """, sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(t) >= 2 THEN
        |      list_distinct(list_transform(range(1, len(t)),
        |        i -> t[i] || ' ' || t[i+1]))
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

    "corpus_cell_quality" -> (quantized +
      """, cent AS (
        |  SELECT vec_id AS cell_id, i, q AS cq FROM v WHERE vec_id < 16
        |), adot AS (
        |  SELECT v.vec_id, c.cell_id, CAST(sum(v.q * c.cq) AS BIGINT) AS d
        |  FROM v JOIN cent c ON v.i = c.i
        |  GROUP BY 1, 2
        |), assigned AS (
        |  SELECT vec_id, cell_id FROM (
        |    SELECT vec_id, cell_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell_id) AS rn
        |    FROM adot) WHERE rn = 1
        |), """.stripMargin + docQuality + """, verdict AS (
        |  SELECT doc_id, keep FROM dq
        |)
        |SELECT cell_id, count(*)::BIGINT AS n_docs,
        |  sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_keep,
        |  (sum(CASE WHEN keep THEN 1 ELSE 0 END) * 1000000
        |    // count(*))::BIGINT AS keep_ppm
        |FROM assigned JOIN verdict ON vec_id = doc_id
        |GROUP BY cell_id ORDER BY cell_id""".stripMargin),

    "dedup_source_stats" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
        |  count(DISTINCT text)::BIGINT AS n_distinct,
        |  (count(*) - count(DISTINCT text))::BIGINT AS n_dup_rows,
        |  ((count(*) - count(DISTINCT text)) * 1000000 // count(*))::BIGINT
        |    AS dup_ppm
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // Cross-source shingle-overlap matrix via per-shingle source
    // bitmasks — the pair expansion runs over the tiny mask census.
    "dedup_source_overlap" -> (shingles3 +
      """, shx AS (
        |  SELECT d.source, unnest(sh.sh) AS shingle
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

    "corpus_pipeline" -> (shingles3 +
      """, shx AS (
        |  SELECT doc_id, unnest(sh) AS shingle FROM sh
        |), dfc AS (
        |  SELECT shingle FROM shx GROUP BY shingle HAVING count(*) <= 100
        |), rare AS (
        |  SELECT shx.doc_id, shx.shingle FROM shx JOIN dfc USING (shingle)
        |), flagged AS (
        |  SELECT DISTINCT t.doc_id
        |  FROM rare b JOIN rare t USING (shingle)
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

    "mm_frame_samples" -> (media +
      """SELECT doc_id, format, f::INT AS frame_no,
        |  greatest(least((f * n_bytes) // n_frames, n_bytes - 1), 0)::BIGINT
        |    AS frame_off,
        |  coalesce(try_cast('0x' || substring(hx,
        |    greatest(least((f * n_bytes) // n_frames, n_bytes - 1), 0)::INT
        |      * 2 + 1, 2) AS INT), 0)::INT AS frame_byte
        |FROM m, range(0, 8) t(f) WHERE f < n_frames
        |ORDER BY doc_id, frame_no""".stripMargin),

    // CDC latest-wins: the oracle states the ONE-SHOT fold over the full
    // changelog; the engine runs the incremental base+delta merge — their
    // equality (delta LSNs strictly newer under the time split) is the
    // invariant being checked.
    "ext_cdc_merge" -> (eventsE +
      """, c AS (
        |  SELECT event_id, user_id, tsu, event_type, value_c,
        |    CASE WHEN event_id % 13 = 0 THEN 'D' ELSE 'U' END AS op
        |  FROM e
        |), r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY tsu DESC, event_id DESC) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n_ops
        |  FROM c
        |)
        |SELECT user_id, event_type, value_c, tsu AS last_ts_us,
        |  n_ops::BIGINT AS n_ops
        |FROM r WHERE rn = 1 AND op = 'U' ORDER BY user_id""".stripMargin),

    "ext_lateness_audit" -> (eventsE +
      """, m AS (
        |  SELECT event_id, tsu,
        |    max(tsu) OVER (PARTITION BY event_id % 8 ORDER BY event_id) AS wm
        |  FROM e
        |), f AS (
        |  SELECT d.delay_us, m.tsu, m.wm
        |  FROM m, (VALUES (0::BIGINT), (60000000::BIGINT),
        |                  (300000000::BIGINT), (1800000000::BIGINT))
        |       d(delay_us)
        |)
        |SELECT delay_us,
        |  sum(CASE WHEN tsu < wm - delay_us THEN 1 ELSE 0 END)::BIGINT
        |    AS n_late,
        |  count(*)::BIGINT AS n_events,
        |  (sum(CASE WHEN tsu < wm - delay_us THEN 1 ELSE 0 END) * 1000000
        |    // count(*))::BIGINT AS late_ppm
        |FROM f GROUP BY delay_us ORDER BY delay_us""".stripMargin),

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

    "ann_range_search" -> (quantized +
      """, cent AS (
        |  SELECT vec_id AS cell_id, i, q AS cq FROM v WHERE vec_id < 16
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
        |    FROM adot WHERE vec_id % 50 = 0) WHERE crank <= 4
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
      """, lab AS (
        |  SELECT vec_id, label FROM embeddings
        |), pr AS (
        |  SELECT vec_id AS query_id, cell_id FROM (
        |    SELECT vec_id, cell_id,
        |      row_number() OVER (PARTITION BY vec_id
        |                         ORDER BY dist, cell_id) AS crank
        |    FROM d2 WHERE vec_id % 50 = 0) WHERE crank <= 4
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

    // Triangle census over the same band-blocked SimHash edge list the
    // pair query states; wedge join + closing-edge check in plain SQL.
    "dedup_triangles" -> (simhashSig +
      """, bands AS (
        |  SELECT doc_id, simhash, band,
        |    (simhash >> (band * 15)) & 32767 AS band_val
        |  FROM sig, range(0, 4) r(band)
        |), e AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.band_val = b.band_val
        |      AND a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
        |), tri AS (
        |  SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
        |  FROM e e1
        |  JOIN e e2 ON e2.doc_a = e1.doc_b
        |  JOIN e e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
        |), pt AS (
        |  SELECT v AS doc_id, count(*)::BIGINT AS n_triangles
        |  FROM (SELECT unnest([a, b, c]) AS v FROM tri) GROUP BY 1
        |), deg AS (
        |  SELECT v AS doc_id, count(*)::BIGINT AS degree
        |  FROM (SELECT doc_a AS v FROM e UNION ALL SELECT doc_b FROM e)
        |  GROUP BY 1
        |)
        |SELECT d.doc_id, d.degree,
        |  coalesce(p.n_triangles, 0)::BIGINT AS n_triangles,
        |  CASE WHEN d.degree >= 2 THEN
        |    coalesce(p.n_triangles, 0) * 2000000 // (d.degree * (d.degree - 1))
        |  ELSE 0 END::BIGINT AS closure_ppm
        |FROM deg d LEFT JOIN pt p USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin),

    "ext_forward_fill" -> (eventsE +
      """, obs AS (
        |  SELECT user_id, day, value_c AS obs_c FROM (
        |    SELECT user_id, day, value_c,
        |      row_number() OVER (PARTITION BY user_id, day
        |                         ORDER BY tsu DESC, event_id DESC) AS rn
        |    FROM e) WHERE rn = 1
        |), spans AS (
        |  SELECT user_id, min(day) AS d0, max(day) AS d1
        |  FROM obs GROUP BY 1
        |), grid AS (
        |  SELECT user_id, unnest(range(d0, d1 + 1)) AS day FROM spans
        |), filled AS (
        |  SELECT g.user_id, g.day, o.obs_c,
        |    last_value(o.obs_c IGNORE NULLS) OVER (
        |      PARTITION BY g.user_id ORDER BY g.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_c
        |  FROM grid g LEFT JOIN obs o
        |    ON o.user_id = g.user_id AND o.day = g.day
        |)
        |SELECT user_id, count(*)::BIGINT AS n_days,
        |  sum(CASE WHEN obs_c IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
        |    AS n_observed,
        |  sum(CASE WHEN obs_c IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_filled,
        |  sum(carried_c)::BIGINT AS sum_carried_c
        |FROM filled GROUP BY user_id ORDER BY user_id""".stripMargin),

    "ext_dau_mau" -> (eventsE +
      """, ud AS (
        |  SELECT DISTINCT user_id, day FROM e
        |), dau AS (
        |  SELECT day, count(*)::BIGINT AS dau FROM ud GROUP BY 1
        |), mau AS (
        |  SELECT day, count(*)::BIGINT AS mau28 FROM (
        |    SELECT DISTINCT user_id, unnest(range(day, day + 28)) AS day
        |    FROM ud) GROUP BY 1
        |), last AS (
        |  SELECT max(day) AS last_day FROM ud
        |)
        |SELECT m.day, coalesce(d.dau, 0)::BIGINT AS dau, m.mau28,
        |  (coalesce(d.dau, 0) * 1000000 // m.mau28)::BIGINT AS stickiness_ppm
        |FROM mau m LEFT JOIN dau d ON d.day = m.day, last
        |WHERE m.day <= last.last_day
        |ORDER BY m.day""".stripMargin),

    "ext_benford" -> (eventsE +
      """, dg AS (
        |  SELECT event_type,
        |    CAST(left(value_c::VARCHAR, 1) AS BIGINT) AS digit
        |  FROM e WHERE value_c > 0
        |), cnt AS (
        |  SELECT event_type, digit, count(*)::BIGINT AS n
        |  FROM dg GROUP BY 1, 2
        |)
        |SELECT event_type, digit, n,
        |  (n * 1000000 // sum(n) OVER (PARTITION BY event_type))::BIGINT
        |    AS share_ppm
        |FROM cnt ORDER BY event_type, digit""".stripMargin),

    // pHash clusters: the pair chain's edges + the same recursive
    // min-label closure the text cluster oracles use.
    "mm_phash_clusters" -> ("WITH RECURSIVE " + media.stripPrefix("WITH ") +
      """, pb AS (
        |  SELECT doc_id, i,
        |    coalesce(try_cast('0x' || substring(hx,
        |      greatest(least((i * n_bytes) // 60, n_bytes - 1), 0)::INT * 2 + 1,
        |      2) AS INT), 0) AS b
        |  FROM m, range(0, 60) t(i)
        |), mn AS (
        |  SELECT doc_id, sum(b) // 60 AS mean FROM pb GROUP BY 1
        |), psig AS (
        |  SELECT pb.doc_id,
        |    CAST(sum(CASE WHEN b > mean THEN (1::BIGINT << i) ELSE 0 END)
        |         AS BIGINT) AS phash
        |  FROM pb JOIN mn USING (doc_id) GROUP BY 1
        |), pbands AS (
        |  SELECT doc_id, phash, band, (phash >> (band * 15)) & 32767 AS band_val
        |  FROM psig, range(0, 4) r(band)
        |), pe AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM pbands a JOIN pbands b
        |    ON a.band = b.band AND a.band_val = b.band_val
        |      AND a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.phash, b.phash)) <= 8
        |), pe2 AS (
        |  SELECT doc_a, doc_b FROM pe
        |  UNION ALL
        |  SELECT doc_b, doc_a FROM pe
        |), rr(v, m2) AS (
        |  SELECT doc_id, doc_id FROM psig
        |  UNION
        |  SELECT e.doc_b, rr.m2 FROM rr JOIN pe2 e ON e.doc_a = rr.v
        |)
        |SELECT v AS doc_id, min(m2) AS cluster_id FROM rr GROUP BY v
        |ORDER BY doc_id""".stripMargin),

    "ext_rfm" -> (eventsE +
      """, u AS (
        |  SELECT user_id, max(day) AS last_day,
        |    count(*)::BIGINT AS n_events, sum(value_c)::BIGINT AS value_c
        |  FROM e GROUP BY 1
        |), q AS (
        |  SELECT user_id, value_c,
        |    ntile(5) OVER (ORDER BY last_day DESC, user_id) AS r,
        |    ntile(5) OVER (ORDER BY n_events DESC, user_id) AS f,
        |    ntile(5) OVER (ORDER BY value_c DESC, user_id) AS m
        |  FROM u
        |)
        |SELECT r::BIGINT AS r, f::BIGINT AS f, m::BIGINT AS m,
        |  count(*)::BIGINT AS n_users, sum(value_c)::BIGINT AS sum_value_c
        |FROM q GROUP BY 1, 2, 3 ORDER BY r, f, m""".stripMargin),

    "ext_value_concentration" -> (eventsE +
      """, u AS (
        |  SELECT user_id, sum(value_c)::BIGINT AS value_c FROM e GROUP BY 1
        |), d AS (
        |  SELECT value_c,
        |    ntile(10) OVER (ORDER BY value_c DESC, user_id) AS decile
        |  FROM u
        |), g AS (
        |  SELECT decile::BIGINT AS decile, count(*)::BIGINT AS n_users,
        |    sum(value_c)::BIGINT AS value_c
        |  FROM d GROUP BY 1
        |)
        |SELECT decile, n_users, value_c,
        |  sum(value_c) OVER (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |    AS cum_value_c,
        |  (sum(value_c) OVER (ORDER BY decile
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000
        |   // sum(value_c) OVER ())::BIGINT AS cum_share_ppm
        |FROM g ORDER BY decile""".stripMargin),
  )
}
