package graft.engine.ext

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession

/** Deterministic SCALE-DERIVED defaults for the operator knobs that must
  * track corpus size — the fix for the "sf0.1-tuned constant ships to a
  * 100 TB cluster" footgun (the r10 study measured the fixed 16-plane SRP
  * default at ~n² pair work: 21× cost on 10× vectors).
  *
  * Every rule here is INTEGER-EXACT (bit-length, ceiling division — no
  * floating-point log whose last ulp could differ between engines), so the
  * DuckDB oracles replay the identical derivation from their own
  * `count(*)` and the engine/oracle configs can never diverge. Explicit
  * parameters still pin any knob; these are only the defaults.
  *
  * The three rules:
  *  - [[srpBitsPerBand]]: SRP band width grows one bit per corpus
  *    doubling past 2^11, holding bucket occupancy — and thus LSH pair
  *    work per vector — at ≤ 2^7 = 128. At the sf0.1 testdata (2,000
  *    vectors) this reproduces the historical 16-plane config exactly;
  *    at sf1 (20,000) it yields the A/B-measured 32-plane fix
  *    (29.2 s → 4.5 s for the full pair build, QUERIES.md).
  *  - [[panelMod]]: recall-QA / search query panels are FIXED-SIZE
  *    (~100 queries) instead of ∝ corpus: with `vec_id % qm = 0` panels
  *    and constant qm, exact-baseline work is panel × corpus = n²/qm —
  *    the r10 sf1 study measured 36.5× on 10× data. qm = ⌈n/100⌉ keeps
  *    the baseline linear while grading the same approximate paths.
  *  - [[tableCount]]: the deterministic corpus count the rules consume,
  *    memoized per (dir, table) path — like
  *    [[graft.engine.StageCache]]'s durable keys, the memo assumes a
  *    corpus directory is immutable for the life of the process.
  */
object ScaleKnobs {

  /** Smallest b with 2^b >= n (integer-exact ceil(log2 n)); 0 for n <= 1.
    * SQL replay: `(SELECT min(b) FROM range(0, 63) t(b)
    * WHERE (1::BIGINT << b) >= n)`.
    */
  def ceilLog2(n: Long): Int =
    if (n <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(n - 1L)

  /** SRP band width in bits: max(4, ceil(log2 n) − 7), capped at 15 so a
    * 4-band signature always fits one BIGINT. Bucket occupancy is bounded
    * by n/2^bits < 2^7 = 128, so banded-LSH pair work per vector
    * (occupancy × bands dot products) stays CONSTANT as the corpus grows
    * — the "+1 plane per band per corpus doubling" deployment rule, as
    * code. The candidate recall at a fixed cosine threshold declines as
    * bits grow (the standard LSH precision/recall trade); pin nPlanes
    * explicitly to hold a recall target instead.
    */
  def srpBitsPerBand(n: Long): Int =
    math.min(15, math.max(4, ceilLog2(n) - 7))

  /** Total SRP hyperplanes for `bands` bands at the derived band width. */
  def srpPlanes(n: Long, bands: Int = 4): Int = bands * srpBitsPerBand(n)

  /** Query-panel modulus: qm = max(50, ⌈n/100⌉). A `id % qm = 0` panel
    * then holds ≤ ~100 queries at any corpus size (and stays at the
    * historical qm=50 for n ≤ 5,000), so exact recall baselines cost
    * O(panel × corpus) = O(n), not O(n²/50). SQL replay:
    * `greatest(50, (count(*) + 99) // 100)`.
    */
  def panelMod(n: Long): Int =
    math.max(50L, (n + 99L) / 100L).toInt

  /** IVF coarse-cell count: 2^⌈log2 √n⌉ — the classical nCells ≈ √n
    * train-time rule, snapped to a power of two so the derivation stays
    * integer-exact (⌈log2 √n⌉ = ⌈⌈log2 n⌉ / 2⌉, an identity of the
    * ceiling), floored at the historical 16 so small corpora reproduce
    * every pre-derivation artifact bit-for-bit. √n balances the two
    * costs a probe pays — ranking nCells centroids vs scanning
    * n/nCells candidates per probed cell — so both sides grow as √n
    * instead of one of them going linear. nprobe stays a PINNED
    * recall/cost dial (the nprobe-sweep query is the tool that sizes it
    * per deployment; a fixed probe FRACTION would hold recall but
    * re-linearize probe cost). SQL replay:
    * `greatest(16, 1 << ((L + 1) // 2))` with L the min-b bit length.
    */
  def ivfCells(n: Long): Int =
    math.max(16, 1 << ((ceilLog2(n) + 1) / 2))

  /** The SAME rules as in-plan Column expressions (for
    * [[Similarity.knobReport]] and anything else that wants the derived
    * value computed inside the query instead of on the driver):
    * ceil(log2 n) = `length(bin(n − 1))` — the integer bit length, exact
    * where a floating `log2` could round differently across engines.
    * ScaleKnobsSpec sweeps these against the Scala functions so the two
    * forms (and the DuckDB replays, via the oracle gate) cannot drift.
    */
  def srpBitsCol(n: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr(
      s"""CASE WHEN $n <= 1 THEN 4L
         |ELSE least(15L, greatest(4L, length(bin($n - 1)) - 7L)) END"""
        .stripMargin)

  def panelModCol(n: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr(s"greatest(50L, ($n + 99) div 100)")

  def ivfCellsCol(n: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr(
      s"""CASE WHEN $n <= 1 THEN 16L
         |ELSE greatest(16L, shiftleft(1L,
         |  cast((length(bin($n - 1)) + 1) div 2 AS int))) END""".stripMargin)

  private val counts = new ConcurrentHashMap[String, java.lang.Long]()

  /** Row count of `dir/table.parquet`, memoized per (path, CONTENT
    * fingerprint) for the life of the process (a parquet metadata count —
    * cheap, but every derived default in a query should agree on one
    * value). The fingerprint is the same listing-shaped digest the
    * durable [[graft.engine.StageCache]] keys by (name/size/mtime), so
    * the two caches agree on what "the same corpus" means: regenerating
    * a table IN PLACE changes its fingerprint, the memo misses, and the
    * knob re-derives from the fresh count — without this, a long-lived
    * JVM would rebuild a durable stage under its new fingerprint key
    * using a STALE memoized count, persisting a wrong derivation that
    * other JVMs then trust (r11 ADVICE). Superseded entries linger in
    * the map unread — bounded by the number of in-place regenerations.
    * Cost per call is one FileSystem listing, far below the count job
    * it memoizes.
    */
  def tableCount(spark: SparkSession, dir: String, table: String): Long = {
    val pathStr = s"$dir/$table.parquet"
    val p = new org.apache.hadoop.fs.Path(pathStr)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    val fp =
      if (st.isDirectory) graft.engine.StageCache.corpusFingerprint(fs, p)
      else s"${st.getLen}|${st.getModificationTime}"
    val key = s"$pathStr|$fp"
    val cached = counts.get(key)
    if (cached != null) cached.longValue()
    else {
      val n = spark.read.parquet(pathStr).count()
      counts.put(key, n)
      n
    }
  }

  def embeddingCount(spark: SparkSession, dir: String): Long =
    tableCount(spark, dir, "embeddings")

  def documentCount(spark: SparkSession, dir: String): Long =
    tableCount(spark, dir, "documents")
}
