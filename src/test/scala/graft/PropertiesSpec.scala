package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.engine.expr.Normalizers
import graft.engine.ingest.Sources
import graft.engine.mysql.MySqlLogPipeline

/** Property-based invariants (SURVEY.md §5.4): normalizer idempotence-class
  * properties and aggregation bounds over generated inputs. Uses raw
  * ScalaCheck generators with fixed seeds (the scalatest-plus bridge is not
  * in the offline cache) — deterministic across runs.
  */
class PropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(0xC0FFEEL + i)))

  private val word: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  test("F2 normalization is idempotent on its own output") {
    val qs = samples(Gen.listOfN(6, Gen.oneOf(word,
      Gen.choose(0, 999).map(_.toString), word.map(w => s"'$w'"))), 20)
      .map(_.mkString("SELECT ", " ", ""))
    val df = qs.toDF("q")
      .select(col("q"), Normalizers.normalizeMySqlQuery(col("q")).as("n"))
      .select(col("n"), Normalizers.normalizeMySqlQuery(col("n")).as("nn"))
    df.collect().foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("F2 output never contains standalone digit words or quoted strings") {
    val qs = samples(Gen.listOfN(5, Gen.oneOf(word,
      Gen.choose(0, 99999).map(_.toString),
      word.map(w => s"'$w'"))), 20).map(_.mkString(" "))
    qs.toDF("q").select(Normalizers.normalizeMySqlQuery(col("q")))
      .collect().map(_.getString(0)).foreach { got =>
        assert(!got.matches("(?s).*\\b\\d+\\b.*"), got)
        assert(!got.matches("(?s).*'[^']*'.*"), got)
      }
  }

  test("F1 normalization is idempotent and preserves JSON structure chars") {
    val json = for {
      ks <- Gen.listOfN(4, word)
      vs <- Gen.listOfN(4, Gen.oneOf(word.map("\"" + _ + "\""),
        Gen.choose(0, 9999).map(_.toString)))
    } yield ks.zip(vs).map { case (k, v) => s""""$k": $v""" }
      .mkString("{", ", ", "}")
    val qs = samples(json, 20)
    val df = qs.toDF("q")
      .select(Normalizers.normalizeMongoQuery(col("q")).as("n"))
      .select(col("n"), Normalizers.normalizeMongoQuery(col("n")).as("nn"))
    df.collect().foreach { r =>
      assert(r.getString(0) === r.getString(1))
      // braces survive fingerprinting (values can't contain {})
      assert(r.getString(0).head === '{' && r.getString(0).last === '}')
    }
  }

  test("mysql aggregate: min <= avg <= max and Executions sums to row count") {
    val specsList = samples(
      Gen.listOfN(8, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(1, 500))), 10)
    specsList.foreach { specs =>
      val entries = specs.zipWithIndex.map { case ((q, ms), i) =>
        s"""# Time: 231026 10:00:0$i
           |# User@Host: u[u] @ h [ip] thread_id: $i
           |# Query_time: ${ms / 1000.0} Lock_time: 0.0 Rows_sent: 1 Rows_examined: 1
           |SET timestamp=$i;
           |SELECT $q;""".stripMargin
      }.mkString("", "\n", "\n")
      val res = MySqlLogPipeline.parse(Sources.fromContent(spark, entries))
      val rows = res.aggregate.collect()
      assert(rows.map(_.getAs[Long]("Executions")).sum === specs.length.toLong)
      rows.foreach { r =>
        val (mn, av, mx) = (r.getAs[Double]("Min_Query_time_ms"),
          r.getAs[Double]("Avg_Query_time_ms"),
          r.getAs[Double]("Max_Query_time_ms"))
        assert(mn <= av + 0.005 && av <= mx + 0.005)
      }
    }
  }
}
