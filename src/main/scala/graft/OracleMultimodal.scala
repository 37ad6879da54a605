package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.ext._
import OraclePreludes._

/** Multimodal (binary payload) queries — split from ExtQueries (registration + DuckDB oracle
  * side by side; ground rules in [[ExtQueries]]).
  */
object OracleMultimodal {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------ multimodal
    "mm_features" -> ((s, dir) => {
      import s.implicits._
      Multimodal.decodeFeatures(s, dir).toDF().orderBy(col("doc_id"))
    }),
    "mm_format_rollup" -> ((s, dir) => Multimodal.formatRollup(s, dir)),
    "mm_dupes" -> ((s, dir) => Multimodal.payloadDupes(s, dir)),
    "mm_resized" -> ((s, dir) => {
      import s.implicits._
      Multimodal.resizeFeatures(s, dir).toDF().orderBy(col("doc_id"))
    }),
    "mm_phash_pairs" -> ((s, dir) => Multimodal.phashPairs(s, dir)),
    "mm_frame_samples" -> ((s, dir) => {
      import s.implicits._
      Multimodal.frameSamples(s, dir).toDF()
        .orderBy(col("doc_id"), col("frame_no"))
    }),
    "mm_phash_clusters" -> ((s, dir) => Multimodal.phashClusters(s, dir)),
  )

  /** Derived-geometry pHash pair chain (r13) — the replay of
    * [[Multimodal.phashPairs]]' derive-default: `sbc` re-derives the
    * band width from the oracle's own count(*) (media is 1:1 with
    * documents), the payload is stride-sampled at 4·bits points and
    * thresholded against the integer mean, per-BAND signature values
    * band-block the candidates, and exact Hamming is the sum of
    * per-band bit_count(xor) against the fraction-preserving derived
    * threshold. At ≤ 65k items bits = 15, which reproduces the
    * historical 60-point single-long chain bit-for-bit.
    */
  private val phashDerived = media + ", " + OraclePreludes.sigBitsCte +
    """, pb AS (
      |  SELECT doc_id, i,
      |    coalesce(try_cast('0x' || substring(hx,
      |      greatest(least((i * n_bytes) // (4 * (SELECT bits FROM sbc)),
      |        n_bytes - 1), 0)::INT * 2 + 1, 2) AS INT), 0) AS b
      |  FROM m, range(0, 120) t(i) WHERE i < 4 * (SELECT bits FROM sbc)
      |), mn AS (
      |  SELECT doc_id, sum(b) // (4 * (SELECT bits FROM sbc)) AS mean
      |  FROM pb GROUP BY 1
      |), sbv AS (
      |  SELECT pb.doc_id, (i // (SELECT bits FROM sbc))::BIGINT AS band,
      |    CAST(sum(CASE WHEN b > mean
      |      THEN (1::BIGINT << (i % (SELECT bits FROM sbc))::INT)
      |      ELSE 0 END) AS BIGINT) AS band_val
      |  FROM pb JOIN mn USING (doc_id) GROUP BY 1, 2
      |), """.stripMargin + OraclePreludes.bucketCapCte +
    """, bok AS (
      |  -- r14 family cap (ScaleKnobs.hammingBucketCap) — the knob that
      |  -- first binds on THIS chain (sf10 pHash max bucket 1,746 vs cap
      |  -- 1,216); buckets past the cap route to exact dedup (mm_dupes)
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

  def oracleSql: Map[String, String] = Map(
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

    "mm_format_rollup" -> (media +
      """SELECT format, count(*) AS n_media,
        |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(sum(frame_byte_sum) AS BIGINT) AS sum_frame_bytes
        |FROM m JOIN fr ON m.doc_id = fr.doc_id
        |GROUP BY format ORDER BY format""".stripMargin),

    "mm_phash_pairs" -> (phashDerived +
      """
        |SELECT doc_a, doc_b, hamming FROM pairs
        |ORDER BY doc_a, doc_b""".stripMargin),

    "mm_frame_samples" -> (media +
      """SELECT doc_id, format, f::INT AS frame_no,
        |  greatest(least((f * n_bytes) // n_frames, n_bytes - 1), 0)::BIGINT
        |    AS frame_off,
        |  coalesce(try_cast('0x' || substring(hx,
        |    greatest(least((f * n_bytes) // n_frames, n_bytes - 1), 0)::INT
        |      * 2 + 1, 2) AS INT), 0)::INT AS frame_byte
        |FROM m, range(0, 8) t(f) WHERE f < n_frames
        |ORDER BY doc_id, frame_no""".stripMargin),

    // pHash clusters: the derived-geometry pair chain's edges + the same
    // recursive min-label closure the text cluster oracles use.
    "mm_phash_clusters" -> ("WITH RECURSIVE " +
      phashDerived.stripPrefix("WITH ") +
      OraclePreludes.simhashDerivedCcChain +
      """
        |SELECT doc_id, cluster_id FROM cl ORDER BY doc_id""".stripMargin),

  )
}
