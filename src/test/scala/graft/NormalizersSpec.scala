package graft

import org.apache.spark.sql.functions._
import graft.engine.expr.Normalizers

/** Golden in/out pairs for the F1/F2 fingerprint functions.
  *
  * Expectations come from EXECUTING the reference implementation (SURVEY.md
  * §2.3 [verified by execution]) — NOT from the reference's own unit tests,
  * two of which contradict the code they test (test_mongo_parser.py:15,20 and
  * test_mysql_parser.py:20-22 fail against their own subject).
  */
class NormalizersSpec extends SparkTestBase {
  import spark.implicits._

  private def mongo(in: String): String =
    Seq(in).toDF("q").select(Normalizers.normalizeMongoQuery(col("q")))
      .head().getString(0)

  private def mysql(in: String): String =
    Seq(in).toDF("q").select(Normalizers.normalizeMySqlQuery(col("q")))
      .head().getString(0)

  // ---------------------------------------------------------------- F1 mongo

  test("F1: find command — collection name IS fingerprinted, space after : consumed") {
    // executed reference: {"find": "users", "filter": {"age": 30}}
    //   → {"find":<value>, "filter": {"age":<value>}}
    assert(mongo("""{"find": "users", "filter": {"age": 30}}""") ===
      """{"find":<value>, "filter": {"age":<value>}}""")
  }

  test("F1: $in array elements are untouched ( ] not in the lookahead )") {
    val in = """{"filter": {"status": {"$in": ["A", "B", "C"]}}}"""
    assert(mongo(in) === in)
  }

  test("F1: quoted string values fingerprint") {
    assert(mongo("""{"name": "alice", "n": 42}""") ===
      """{"name":<value>, "n":<value>}""")
  }

  test("F1: nested objects fingerprint per-leaf") {
    assert(mongo("""{"a": {"b": {"c": 1}}}""") === """{"a": {"b": {"c":<value>}}}""")
  }

  test("F1: empty object unchanged") {
    assert(mongo("{}") === "{}")
  }

  // ---------------------------------------------------------------- F2 mysql

  test("F2: integers and strings become ?, everything uppercased") {
    assert(mysql("SELECT * FROM users WHERE id = 123 AND name = 'bob'") ===
      "SELECT * FROM USERS WHERE ID = ? AND NAME = ?")
  }

  test("F2: decimals become ?.? (two integer matches), NOT ?") {
    // the reference's own test expects "PRICE > ?" and FAILS; executed
    // behavior is ?.? (SURVEY.md §5.2)
    assert(mysql("SELECT * FROM items WHERE price > 19.99") ===
      "SELECT * FROM ITEMS WHERE PRICE > ?.?")
  }

  test("F2: string alternative wins over digits inside quotes") {
    assert(mysql("SELECT 1 FROM t WHERE sku = 'ABC-123'") ===
      "SELECT ? FROM T WHERE SKU = ?")
  }

  test("F2: digits inside identifiers (no word boundary) survive") {
    assert(mysql("SELECT col1 FROM t2x") === "SELECT COL1 FROM T2X")
  }

  test("F2: digits that ARE word-bounded inside backticks normalize") {
    assert(mysql("SELECT `a`.`2` FROM a") === "SELECT `A`.`?` FROM A")
  }

  // ---------------------------------------------------------------- F3 strip

  test("pyStrip removes all leading/trailing whitespace incl newlines/tabs") {
    val got = Seq("\n\t hello world \r\n").toDF("s")
      .select(Normalizers.pyStrip(col("s"))).head().getString(0)
    assert(got === "hello world")
  }

  test("pyStrip keeps interior whitespace") {
    val got = Seq("a  b\nc").toDF("s")
      .select(Normalizers.pyStrip(col("s"))).head().getString(0)
    assert(got === "a  b\nc")
  }

  // ---------------------------------------------------------------- F4 key

  test("errorSignature joins msg|codeName|errmsg") {
    val got = Seq(("m", "c", "e")).toDF("a", "b", "c")
      .select(Normalizers.errorSignature(col("a"), col("b"), col("c")))
      .head().getString(0)
    assert(got === "m|c|e")
  }
}
