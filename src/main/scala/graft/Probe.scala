package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch probe for Spark semantics the engine depends on. Not part of the
  * library surface; run with `sbt "runMain graft.Probe"`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 1. get_json_object: raw substring or compact re-serialization?
    val j = Seq("""{"a": {"b": 1, "c": "x y"}, "arr": [{"$match": {"k": 5}}, {"$limit": 2}]}""").toDF("s")
    j.select(
      get_json_object($"s", "$.a").as("obj"),
      get_json_object($"s", "$.arr[0].$match").as("dollar_plain"),
      get_json_object($"s", "$.arr[0]['$match']").as("dollar_quoted"),
      get_json_object($"s", "$.missing").as("missing")
    ).show(false)

    // 2. from_json on invalid / scalar / partial input
    val sch = StructType(Seq(
      StructField("msg", StringType),
      StructField("s", StringType),
      StructField("attr", StructType(Seq(StructField("n", LongType))))))
    Seq("not json", "5", """{"msg": "hi"}""", """{"msg": null, "s": "E"}""")
      .toDF("v")
      .select($"v", from_json($"v", sch).as("j"), try_parse_json($"v").isNotNull.as("valid"))
      .select($"v", $"j", $"valid", $"j".isNull.as("jnull"), $"j.msg".as("m"))
      .show(false)

    // 3. floor() result type; split with limit; posexplode multi-alias
    val t = Seq(("a.b.c", 1.7)).toDF("ns", "v")
    val ty = t.select(floor($"v" * 10).as("f"), split($"ns", "\\.", -1).as("sp"))
    ty.printSchema()
    t.select(posexplode(split($"ns", "\\.", -1)).as(Seq("pos", "part"))).show()

    // 4. rlike with inline (?s) and \z, empty capture
    Seq("SET timestamp=1;\nSELECT 1;\n# Time: x", "SET timestamp=1;\n")
      .toDF("e")
      .select($"e".rlike("(?s)SET timestamp=.*?;\n(.*?)(?=\n# Time:|\\z)").as("m"),
              regexp_extract($"e", "(?s)SET timestamp=.*?;\n(.*?)(?=\n# Time:|\\z)", 1).as("cap"))
      .show(false)

    // 5. parquet write with space/paren column names
    val out = "/tmp/probe_parquet"
    Seq((1.0, "x")).toDF("Query_time (ms)", "User@Host").write.mode("overwrite").parquet(out)
    spark.read.parquet(out).show()

    // 6. min_by, ansi cast behavior via try_cast expr
    Seq(("a", 2L, "q2"), ("a", 1L, "q1")).toDF("k", "n", "q")
      .groupBy($"k").agg(min_by($"q", $"n").as("first_q")).show()
    Seq("abc", "1.5").toDF("x").select(expr("try_cast(x as double)").as("d")).show()

    // 7. element_at on split of empty string
    Seq("").toDF("ns").select(
      element_at(split($"ns", "\\.", -1), 1).as("app"),
      size(split($"ns", "\\.", -1)).as("n")).show()

    spark.stop()
  }
}
