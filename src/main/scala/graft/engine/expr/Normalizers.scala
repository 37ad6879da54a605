package graft.engine.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Query-fingerprinting and key-building scalar functions.
  *
  * All of these are pure built-in Catalyst expressions (no UDFs), so they stay
  * inside whole-stage codegen and Catalyst can optimize through them. The
  * regex patterns are the observable spec of the reference implementation
  * (see /root/reference/Mongo/mongo_parser.py:12-14 and
  * /root/reference/MySql/mysqlLogParser.py:8-13); both are valid Java regex
  * verbatim (lookahead, lazy quantifiers and \b are supported).
  */
object Normalizers {

  /** Mongo query fingerprint (F1, mongo_parser.py:12-14).
    *
    * Replaces `: value` runs (optionally quoted, not containing `,{}[]`,
    * followed by `,` or `}`) with `:<value>`. Verified-by-execution semantics
    * (SURVEY.md §2.3): collection names ARE fingerprinted, the space after
    * `:` is consumed, and bare array elements are left untouched.
    */
  val MongoNormalizePattern = "(:\\s*[\"']?[^,{}\\[\\]]+[\"']?\\s*(?=[,}]))"

  def normalizeMongoQuery(query: Column): Column =
    regexp_replace(query, MongoNormalizePattern, ":<value>")

  /** MySQL query fingerprint (F2, mysqlLogParser.py:8-13).
    *
    * Integer literals and single-quoted strings become `?`, then the whole
    * query is uppercased (identifiers included). Verified-by-execution:
    * decimals become `?.?` (two integer matches around the dot) and the
    * string alternative wins over digits inside quotes.
    */
  val MySqlNormalizePattern = "(\\b\\d+\\b)|('[^']*')"

  def normalizeMySqlQuery(query: Column): Column =
    upper(regexp_replace(query, MySqlNormalizePattern, "?"))

  /** Python str.strip() semantics (F3): remove ALL leading/trailing
    * whitespace. Spark's trim() strips only ASCII spaces — a trailing
    * newline on a multi-line query would survive it. Java's \s is
    * ASCII-only, so the class adds the code points Python's str.strip()
    * also removes: \x1c-\x1f (file/group/record/unit separators), \x85
    * (NEL) and the Unicode Z categories (NBSP, line/para separators...).
    */
  val PyWhitespaceClass = "[\\s\\u001C-\\u001F\\u0085\\p{Z}]"

  def pyStrip(c: Column): Column =
    regexp_replace(c, s"^$PyWhitespaceClass+|$PyWhitespaceClass+$$", "")

  /** Error-signature composite key (F4, mongo_parser.py:78).
    * Only used where a single string key is needed; the aggregation itself
    * groups on the three columns (equivalent, and skew/collision-safe).
    */
  def errorSignature(msg: Column, codeName: Column, errmsg: Column): Column =
    concat_ws("|", msg, codeName, errmsg)
}
