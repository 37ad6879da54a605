package graft

import org.apache.spark.sql.functions._
import graft.engine.ext.Similarity

/** Invariant tests complementing the exact oracles: ANN recall vs brute
  * force (the oracle proves determinism, recall proves USEFULNESS) and
  * the sketch rollup's error bounds vs exact aggregates.
  */
class ApproxInvariantsSpec extends SparkTestBase {
  import spark.implicits._

  test("IVF top-k has high recall vs brute force on clustered vectors") {
    // 4 tight clusters of 25 vectors each; centers far apart, so cell
    // assignment is clean and nprobe=2 must recover most true neighbors.
    val rnd = new scala.util.Random(7)
    val centers = Seq.tabulate(4)(c => Array.tabulate(64)(d =>
      if (d % 4 == c) 1.0f else 0.0f))
    val vecs = (0 until 100).map { i =>
      val c = i % 4
      val e = centers(c).zipWithIndex
        .map { case (v, _) => v + (rnd.nextFloat() - 0.5f) * 0.05f }
      (i.toLong, e.toSeq, c)
    }
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    def topSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("neighbor_id")).toSet }

    val brute = topSet(Similarity.bruteForceTopK(spark, dir, k = 5, queryMod = 10))
    val ivf = topSet(Similarity.ivfTopK(spark, dir, k = 5, queryMod = 10,
      nCells = 4, nprobe = 2))
    val recalls = brute.map { case (q, b) =>
      ivf.get(q).map(i => (i & b).size.toDouble / b.size).getOrElse(0.0)
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.8, s"mean recall $meanRecall too low")

    // trained cells must be at least as useful on the same fixture
    val trained = topSet(Similarity.ivfTrainedTopK(spark, dir, k = 5,
      queryMod = 10, nCells = 4, iters = 2, nprobe = 2))
    val trainedRecalls = brute.map { case (q, b) =>
      trained.get(q).map(i => (i & b).size.toDouble / b.size).getOrElse(0.0)
    }
    val meanTrained = trainedRecalls.sum / trainedRecalls.size
    assert(meanTrained >= 0.8, s"trained mean recall $meanTrained too low")

    // PQ ADC over the same fixture: within a tight cluster every member
    // collapses to the SAME 8 codes, so ADC dots tie exactly and
    // neighbor-set recall vs the noise-ranked brute force is the wrong
    // yardstick — the meaningful invariant is cluster PRECISION: all
    // returned neighbors must be true cluster-mates of the query.
    val pq = topSet(Similarity.pqSearchTopK(spark, dir, topK = 5,
      queryMod = 10, M = 8, subDim = 8, k = 4, iters = 2))
    assert(pq.size === 10, s"expected 10 PQ query groups, got ${pq.size}")
    pq.foreach { case (q, neighbors) =>
      assert(neighbors.size === 5, s"query $q returned ${neighbors.size}")
      assert(neighbors.forall(n => n % 4 == q % 4),
        s"query $q (cluster ${q % 4}) got cross-cluster neighbors " +
          neighbors.filter(_ % 4 != q % 4))
    }

    // IVF-PQ composed index on the same fixture: the coarse cells prune
    // to cluster-mates and ADC ties within a cluster, so (like the flat
    // PQ check above) the invariant is cluster precision — every
    // returned neighbor is a true cluster-mate — plus full result shape.
    val ivfpq = topSet(Similarity.ivfPqTopK(spark, dir, topK = 5,
      shortlist = 15, queryMod = 10, nCells = 4, ivfIters = 2, nprobe = 2,
      M = 8, subDim = 8, pqK = 4, pqIters = 2))
    assert(ivfpq.size === 10, s"expected 10 IVF-PQ query groups, got ${ivfpq.size}")
    ivfpq.foreach { case (q, neighbors) =>
      assert(neighbors.size === 5, s"query $q returned ${neighbors.size}")
      assert(neighbors.forall(n => n % 4 == q % 4),
        s"query $q (cluster ${q % 4}) got cross-cluster neighbors " +
          neighbors.filter(_ % 4 != q % 4))
    }

    // SRP-LSH buckets: cluster-mates project to near-identical signatures
    // (the cluster axes dominate every hyperplane dot), so band candidates
    // recover the true neighbor set without any trained structure.
    val srp = topSet(Similarity.srpTopK(spark, dir, k = 5, queryMod = 10,
      nPlanes = 16, bands = 4, dims = 64))
    val srpRecalls = brute.map { case (q, b) =>
      srp.get(q).map(i => (i & b).size.toDouble / b.size).getOrElse(0.0)
    }
    val meanSrp = srpRecalls.sum / srpRecalls.size
    assert(meanSrp >= 0.8, s"SRP mean recall $meanSrp too low")
  }

  test("hybrid RRF equals an independent fusion of its two input lists") {
    val dir = "/root/testdata/sf0.001"
    val dense = Similarity.bruteForceTopK(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Int]("rank").toLong).toMap
    val lex = graft.engine.ext.TextAnalysis.tfidfTopK(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Long]("rank")).toMap
    val expected = (dense.keySet ++ lex.keySet).groupBy(_._1).flatMap {
      case (q, keys) =>
        keys.toSeq
          .map { k =>
            val score = dense.get(k).map(r => 1000000L / (60 + r)).getOrElse(0L) +
              lex.get(k).map(r => 1000000L / (60 + r)).getOrElse(0L)
            (k._2, score)
          }
          .sortBy { case (n, s) => (-s, n) }.take(10).zipWithIndex
          .map { case ((n, s), i) => (q, i + 1L, n, s) }
    }.toSet
    val got = Similarity.hybridRrf(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("rrf_score"))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
    // a neighbor present in BOTH lists must carry both rank columns
    val both = Similarity.hybridRrf(spark, dir).collect()
      .filter(r => !r.isNullAt(r.fieldIndex("dense_rank")) &&
        !r.isNullAt(r.fieldIndex("lex_rank")))
    both.foreach { r =>
      val s = 1000000L / (60 + r.getAs[Long]("dense_rank")) +
        1000000L / (60 + r.getAs[Long]("lex_rank"))
      assert(r.getAs[Long]("rrf_score") === s)
    }
  }

  test("ivfIndexUpdate census partitions every vector exactly once") {
    val dir = "/root/testdata/sf0.001"
    val total = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val rows = Similarity.ivfIndexUpdate(spark, dir).collect()
    // the base/new split is a partition: every vector lands in exactly
    // one cell on exactly one side
    assert(rows.map(_.getAs[Long]("n_base")).sum +
      rows.map(_.getAs[Long]("n_new")).sum === total)
    // the batch is non-degenerate (~1/5 of non-seed ids) and every cell
    // row is internally consistent
    assert(rows.map(_.getAs[Long]("n_new")).sum > 0)
    rows.foreach { r =>
      val (nb, nn) = (r.getAs[Long]("n_base"), r.getAs[Long]("n_new"))
      assert(r.getAs[Long]("growth_ppm") === nn * 1000000L / math.max(nb, 1L))
      assert(nb > 0 || nn > 0)
    }
  }

  test("dimStats covers every dimension with the full population, bounds ordered") {
    val dir = "/root/testdata/sf0.001"
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val r = Similarity.dimStats(spark, dir).collect()
    assert(r.length === 64) // one row per embedding dimension
    r.foreach { row =>
      assert(row.getAs[Long]("n_vecs") === n) // no dim dropped or padded
      val (lo, hi, mean) = (row.getAs[Long]("min_q"),
        row.getAs[Long]("max_q"), row.getAs[Long]("mean_q"))
      assert(lo <= mean && mean <= hi)
      assert(row.getAs[Long]("n_zero") <= n)
    }
  }

  test("sketch rollup: approx distinct within 5% of exact, percentiles ordered") {
    val rows = graft.engine.ext.Sessionize
      .sketchRollup(spark, "/root/testdata/sf0.001").collect()
    val exact = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getString(0)
      val approx = r.getAs[Long]("approx_users")
      val ex = exact(et)
      assert(math.abs(approx - ex).toDouble / ex <= 0.05,
        s"$et: approx $approx vs exact $ex")
      val (p50, p95, p99) = (r.getAs[Double]("value_p50"),
        r.getAs[Double]("value_p95"), r.getAs[Double]("value_p99"))
      assert(p50 <= p95 && p95 <= p99)
    }
  }
}
