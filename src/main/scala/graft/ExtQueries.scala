package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.ext._

/** Extension-operator registrations (relational, sessionization, text
  * analysis, dedup, similarity, multimodal) with their DuckDB oracles.
  * Merged into [[SparkEntry.queries]] / [[SparkEntry.oracleSql]].
  *
  * Oracle-parity ground rules (see SURVEY.md §7.2):
  *  - similarity/ratio outputs are integer (ppm / quantized dot products),
  *    never rounded doubles;
  *  - money sums go through decimal(18,2);
  *  - DuckDB regexp_replace needs the explicit 'g' flag (Spark is global
  *    by default);
  *  - integer division: Spark `(a / b).cast("long")` truncates, DuckDB
  *    `//` floors — identical for the non-negative values used here;
  *  - every query ends in a total ORDER BY mirrored by the oracle.
  */
object ExtQueries {

  /** (family name, registrations, oracles) — the family is REGISTRY
    * metadata (see [[QueryMeta]]): derived from which module registered
    * the query, so it can never drift from the code the way a hand-kept
    * label could.
    */
  private[graft] val families = Seq(
    ("relational", OracleRelational.queries, OracleRelational.oracleSql),
    ("events", OracleEvents.queries, OracleEvents.oracleSql),
    ("dedup", OracleDedup.queries, OracleDedup.oracleSql),
    ("ann", OracleAnn.queries, OracleAnn.oracleSql),
    ("text", OracleText.queries, OracleText.oracleSql),
    ("corpus", OracleCorpus.queries, OracleCorpus.oracleSql),
    ("multimodal", OracleMultimodal.queries, OracleMultimodal.oracleSql))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    families.iterator.map(_._2).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    families.iterator.map(_._3).reduce(_ ++ _)
}
