package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.ext._
import OraclePreludes._

/** Event-stream (sessionization, engagement, temporal-join, streaming-twin) queries — split from ExtQueries (registration + DuckDB oracle
  * side by side; ground rules in [[ExtQueries]]).
  */
object OracleEvents {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    "ext_type_unpivot" -> ((s, dir) => Sessionize.typeUnpivot(s, dir)),
    "ext_hourly_spikes" -> ((s, dir) => Sessionize.hourlySpikes(s, dir)),
    "ext_hourly_rollup" -> ((s, dir) => Sessionize.hourlyRollup(s, dir)),
    "ext_sliding_rollup" -> ((s, dir) => Sessionize.slidingRollup(s, dir)),
    "ext_asof_click" -> ((s, dir) => TemporalJoins.asofClickBeforePurchase(s, dir)),
    "ext_range_views" -> ((s, dir) => TemporalJoins.viewsBeforePurchase(s, dir)),
    "ext_salted_rollup" -> ((s, dir) => Sessionize.saltedTypeRollup(s, dir)),
    "ext_funnel" -> ((s, dir) => Sessionize.funnel(s, dir)),
    "ext_cms_hitters" -> ((s, dir) => Sessionize.cmsHitters(s, dir)),
    "ext_type_pivot" -> ((s, dir) => Sessionize.typePivot(s, dir)),
    "ext_exact_percentiles" -> ((s, dir) => Sessionize.exactPercentiles(s, dir)),
    "ext_scale_quantiles" -> ((s, dir) => Sessionize.scaleQuantiles(s, dir)),
    "ext_scale_quantiles_by_type" ->
      ((s, dir) => Sessionize.scaleQuantilesByType(s, dir)),
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
    // left-outer interval join: unmatched purchases surface on state
    // eviction in streaming; the same code on bounded input is what the
    // NOT EXISTS oracle checks
    "stream_unattributed_batch" -> ((s, dir) =>
      graft.engine.streaming.EventStream.unattributedPurchasesBatch(s, dir)),
    // sketch-accuracy audit: exact values + within-band flags comparing
    // the HLL/GK sketches against their exact counterparts in-engine;
    // deterministic output, fully hash-checkable (the oracle computes the
    // same exact values and asserts literal all-true flags).
    "ext_sketches" -> ((s, dir) => Sessionize.sketchAudit(s, dir)),
    "ext_lateness_audit" -> ((s, dir) => Sessionize.latenessAudit(s, dir)),
    "ext_forward_fill" -> ((s, dir) => Sessionize.forwardFill(s, dir)),
    "ext_dau_mau" -> ((s, dir) => Sessionize.dauMau(s, dir)),
    "ext_benford" -> ((s, dir) => Sessionize.benfordAudit(s, dir)),
    "ext_rfm" -> ((s, dir) => Sessionize.rfmSegments(s, dir)),
    "ext_value_concentration" ->
      ((s, dir) => Sessionize.valueConcentration(s, dir)),
  )

  def oracleSql: Map[String, String] = Map(
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

    // Twin of the LEFT-OUTER interval join: purchases with no in-horizon
    // view by the same user.
    "stream_unattributed_batch" ->
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS purchase_us,
        |  CAST(floor(p."value" * 100 + 0.5) AS BIGINT) AS value_c
        |FROM events p
        |WHERE p.event_type = 'purchase' AND NOT EXISTS (
        |  SELECT 1 FROM events v
        |  WHERE v.event_type = 'view' AND v.user_id = p.user_id
        |    AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR)
        |ORDER BY p.event_id""".stripMargin,

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

    // Pivot -> unpivot round trip: equals the plain long-form census.
    "ext_type_unpivot" ->
      """SELECT user_id, event_type, count(*)::BIGINT AS n
        |FROM events GROUP BY 1, 2 ORDER BY user_id, event_type""".stripMargin,

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

    // Corpus-scale exact quantiles at two grains: the discrete-quantile
    // contract is restated as the same ⌈q·n⌉ rank selection the engine
    // computes — never an engine quantile() whose interpolation could
    // differ.
    "ext_scale_quantiles" ->
      (eventsE + """, evg AS (
        |  SELECT value_c AS v, event_id AS tb FROM e
        |), usg AS (
        |  SELECT sum(value_c)::BIGINT AS v, user_id AS tb
        |  FROM e GROUP BY user_id
        |), q(q_ppm) AS (VALUES (500000), (900000), (990000), (999000)),
        |er AS (
        |  SELECT v, row_number() OVER (ORDER BY v, tb) AS rk,
        |    count(*) OVER () AS n
        |  FROM evg
        |), ur AS (
        |  SELECT v, row_number() OVER (ORDER BY v, tb) AS rk,
        |    count(*) OVER () AS n
        |  FROM usg
        |)
        |SELECT grain, q_ppm, n, rank, value_c FROM (
        |  SELECT 'event' AS grain, q_ppm::BIGINT AS q_ppm, n::BIGINT AS n,
        |    rk::BIGINT AS rank, v AS value_c
        |  FROM er JOIN q ON rk = (n * q_ppm + 999999) // 1000000
        |  UNION ALL
        |  SELECT 'user' AS grain, q_ppm::BIGINT AS q_ppm, n::BIGINT AS n,
        |    rk::BIGINT AS rank, v AS value_c
        |  FROM ur JOIN q ON rk = (n * q_ppm + 999999) // 1000000
        |) ORDER BY grain, q_ppm""".stripMargin),

    // Per-type exact quantiles: the same ⌈q·n⌉ rank selection, grouped.
    "ext_scale_quantiles_by_type" ->
      (eventsE + """, r AS (
        |  SELECT event_type, value_c,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY value_c, event_id) AS rk,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM e
        |), q(q_ppm) AS (VALUES (500000), (900000), (990000), (999000))
        |SELECT event_type, q_ppm::BIGINT AS q_ppm, n::BIGINT AS n,
        |  rk::BIGINT AS rank, value_c
        |FROM r JOIN q ON rk = (n * q_ppm + 999999) // 1000000
        |ORDER BY event_type, q_ppm""".stripMargin),

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
