package graft.engine.mongo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cheap shape-suspicion prefilter for the reference parser's exception
  * semantics. The EXACT check lives in [[graft.engine.expr.PyParity]]
  * (one native codegen'd expression, one jackson parse per evaluated
  * row); this prefilter keeps that parse off the hot path: a
  * schema-conforming row that is not suspicious can never make the
  * reference raise, so the scan skips the check entirely for it.
  *
  * Substring tests only — no parsed-struct references: filter predicates
  * do not get subexpression elimination, so every `j` reference inside a
  * filter becomes its own from_json call. False positives only cost one
  * parity-check call. A false NEGATIVE needs a bad shape whose marker
  * substring also appears nested elsewhere in the line (e.g. a numeric
  * real ns plus a literal `"ns":"` inside the command document) — for
  * t/attr such a shape is corrupt and probes anyway; for ns/command it
  * is a documented non-goal (mongod emits neither).
  */
object MongoPyParity {

  private val L = col("line")

  /** True iff a reference raise is POSSIBLE for a schema-conforming row
    * (superset). Expects `is_slow` on the row.
    */
  def suspicious: Column = {
    // every well-formed mongod line starts with its t document
    val tSus = !L.startsWith("{\"t\":{")
    val aSus = L.contains("\"attr\":") && !L.contains("\"attr\":{")
    // a well-shaped ns is always a string → `"ns":"`; covers numeric/null
    val nsSus = L.contains("\"ns\":") && !L.contains("\"ns\":\"")
    // a well-shaped command is always an object (command is NOT in the
    // schema, so a scalar one never trips the corrupt record)
    val cmdSus = L.contains("\"command\":") && !L.contains("\"command\":{")
    // `"error": null` parses to a null struct without a corrupt record
    val errSus = L.contains("\"s\":\"E\"") &&
      L.contains("\"error\":") && !L.contains("\"error\":{")
    (col("is_slow") && (tSus || aSus || nsSus || cmdSus)) || errSus
  }
}
