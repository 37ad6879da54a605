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

    "mm_frame_samples" -> (media +
      """SELECT doc_id, format, f::INT AS frame_no,
        |  greatest(least((f * n_bytes) // n_frames, n_bytes - 1), 0)::BIGINT
        |    AS frame_off,
        |  coalesce(try_cast('0x' || substring(hx,
        |    greatest(least((f * n_bytes) // n_frames, n_bytes - 1), 0)::INT
        |      * 2 + 1, 2) AS INT), 0)::INT AS frame_byte
        |FROM m, range(0, 8) t(f) WHERE f < n_frames
        |ORDER BY doc_id, frame_no""".stripMargin),

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
        |), pe2 AS MATERIALIZED (
        |  -- MATERIALIZED: stop the recursion re-inlining the pHash chain
        |  -- per iteration (same evaluation hint as the text CC oracles).
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

  )
}
