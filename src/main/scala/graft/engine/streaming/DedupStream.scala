package graft.engine.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.engine.ext.Dedup

/** Incremental near-duplicate detection over a document STREAM — the
  * streaming twin of [[Dedup.minhashPairs]], for the ingest-time question
  * batch dedup can't answer: "is this new document a near-dup of anything
  * we have EVER accepted?"
  *
  * Same math as the batch operator (word n-gram shingles → MinHash(16)
  * universal-hash signatures → 4-band LSH), restructured for streaming:
  * the signature is a per-row projection (array_min over the shingle-hash
  * array instead of an explode + min aggregate — no shuffle, no state),
  * and bucket membership lives in flatMapGroupsWithState keyed by
  * (band, bucket). A new document compares against only its bucket's
  * retained members — the same Σ bucket² bound as the batch LSH join,
  * amortized over arrival order.
  *
  * State bounds: buckets retain at most `maxBucket` members (FIFO-evicted;
  * an adversarial hot bucket degrades recall, never memory), and a
  * production deployment adds a watermark + EventTimeTimeout to age
  * buckets out — the test-facing default keeps NoTimeout so results are
  * a pure function of the input.
  *
  * The same (doc_a, doc_b) pair can surface from several agreeing bands
  * (each tagged with its band); consumers dedup with a downstream
  * distinct, exactly like the batch operator does internally.
  */
object DedupStream {

  final case class BandDoc(band: Int, bucket: String, doc_id: Long,
                           sig: Seq[Long])
  final case class DupPair(doc_a: Long, doc_b: Long, band: Int,
                           est_jaccard_ppm: Long)

  /** Per-row MinHash signatures — streaming-stateless (no aggregation).
    * Hash family and constants are identical to [[Dedup.minhashPairs]],
    * so batch and stream agree bit-for-bit on every signature.
    */
  def signatures(docs: DataFrame, n: Int = 3, numHashes: Int = 16): DataFrame = {
    val p = 2305843009213693951L // 2^61 - 1
    docs
      // each stage projected before the next references it: higher-order
      // functions are interpreted, so an inlined tokenization would be
      // re-evaluated per lambda call (the 15× trap documented in Dedup)
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .select(col("doc_id"), Dedup.shinglesFromTokens(col("toks"), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        transform(col("sh"), s => Dedup.md5Hash48(s)).as("hs"))
      .select(col("doc_id"),
        array((0 until numHashes).map { i =>
          val a = 2L * i + 3L
          val b = 7919L * (i + 1)
          array_min(transform(col("hs"), h => pmod(h * a + b, lit(p))))
        }: _*).as("sig"))
  }

  /** Band/bucket projection over a (doc_id, sig) signature DataFrame —
    * the ONE definition of the bucket encoding, shared by the streaming
    * pair emitter and the batch twin: one row per (band, bucket, doc_id,
    * sig). Changing this changes both sides together, preserving the
    * bit-for-bit stream/batch agreement the oracle depends on.
    */
  def bandedFromSignatures(sig: DataFrame, numHashes: Int,
                           bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val perBand = numHashes / bands
    sig
      .select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(col("band"),
        md5(concat_ws(",",
          slice(col("sig"), col("band") * perBand + 1, lit(perBand))))
          .as("bucket"),
        col("doc_id"), col("sig"))
  }

  /** [[bandedFromSignatures]] over the streaming per-row signatures. */
  def banded(docs: DataFrame, n: Int = 3, numHashes: Int = 16,
             bands: Int = 4): DataFrame =
    bandedFromSignatures(signatures(docs, n, numHashes), numHashes, bands)

  /** Streaming LSH pair emission (Append mode). */
  def pairs(docs: DataFrame, n: Int = 3, numHashes: Int = 16, bands: Int = 4,
            minEstPpm: Long = 250000L, maxBucket: Int = 64): Dataset[DupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._

    banded(docs, n, numHashes, bands).as[BandDoc]
      .groupByKey(bd => (bd.band, bd.bucket))
      .flatMapGroupsWithState[List[BandDoc], DupPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state) =>
          var members = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[DupPair]
          // arrival order within a batch is partition order; pairs are
          // emitted id-ascending so results don't depend on it
          rows.foreach { r =>
            if (!members.exists(_.doc_id == r.doc_id)) { // re-delivery guard
              members.foreach { m =>
                val agree = m.sig.iterator.zip(r.sig.iterator)
                  .count { case (x, y) => x == y }
                val ppm = agree.toLong * 1000000L / numHashes
                if (ppm >= minEstPpm) {
                  val (a, b) =
                    if (m.doc_id < r.doc_id) (m.doc_id, r.doc_id)
                    else (r.doc_id, m.doc_id)
                  out += DupPair(a, b, r.band, ppm)
                }
              }
              members = (r :: members).take(maxBucket)
            }
          }
          state.update(members)
          out.result().iterator
      }
  }

  /** Batch twin of [[pairs]], oracle-checkable: over a bounded input
    * where every document arrives once and no bucket overflows
    * `maxBucket`, the stream's emitted set (id-ascending, per agreeing
    * band) is exactly "all in-bucket pairs whose full-signature
    * agreement clears `minEstPpm`" — stated here as the equi-join it
    * is. Same [[banded]] projection code as the stream, so signatures
    * and buckets agree bit-for-bit.
    *
    * Scale shape: the join key is (band, bucket) — an equi-join whose
    * per-key fan-out is a bucket of near-identical signatures, the same
    * Σ bucket² bound as the batch LSH operator; never all-pairs.
    */
  def pairsBatch(spark: org.apache.spark.sql.SparkSession, dir: String,
                 n: Int = 3, numHashes: Int = 16, bands: Int = 4,
                 minEstPpm: Long = 250000L): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // Signatures via the AGGREGATE path (explode shingles → numHashes
    // codegen'd map-side-combinable min aggregates), not the stream's
    // per-row interpreted array transforms: both hash the same distinct
    // shingle set with the same permutation family, so the values agree
    // bit-for-bit (DedupStreamSpec executes both and asserts equality),
    // but the per-row HOF form costs 15×-class interpreted-lambda
    // overhead that only the stateless streaming context justifies.
    val p = 2305843009213693951L // 2^61 - 1
    val ex = Dedup.shingleRows(docs.select(col("doc_id"), col("text")), n)
      .select(col("doc_id"), Dedup.md5Hash48(col("shingle")).as("h"))
    val sigCols = (0 until numHashes).map { i =>
      val a = 2L * i + 3L
      val b = 7919L * (i + 1)
      min(pmod(col("h") * a + b, lit(p))).as(s"mh_$i")
    }
    val sig = ex.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"mh_$i")): _*).as("sig"))
    // the SAME bucket encoding as the stream, by construction
    val b = bandedFromSignatures(sig, numHashes, bands)
    val left = b.select(col("band"), col("bucket"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val right = b.select(col("band"), col("bucket"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    left.join(right, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("agree",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          v => v)))
      .withColumn("est_jaccard_ppm",
        expr(s"agree * 1000000L div $numHashes"))
      .filter(col("est_jaccard_ppm") >= minEstPpm)
      .select(col("doc_a"), col("doc_b"), col("band").cast("long").as("band"),
        col("est_jaccard_ppm"))
      .orderBy(col("doc_a"), col("doc_b"), col("band"))
  }
}
