package graft.engine

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped materialized intermediates ("build once, reuse").
  *
  * Several registered queries ride the same expensive deterministic
  * intermediate — most prominently the SimHash near-dup pair list and the
  * connected-components cluster table, which seven dedup/corpus queries
  * consume. In production that table is materialized once per corpus
  * snapshot and every downstream policy (canonical pick, down-weighting,
  * size histogram, duplication-quality audit) reads the materialization;
  * rebuilding the shingle-explode → 60-bit vote → band-bucket → pointer-
  * jumping chain per query is pure waste at any scale.
  *
  * This cache is that materialization, scoped to one SparkSession:
  *  - key = (session, canonical input dir, stage name) — two scale
  *    factors or two sessions never share an entry;
  *  - value = the stage's DataFrame after `localCheckpoint(eager)`, i.e.
  *    computed once and pinned in the block manager (same mechanism the
  *    iterative loops already use for loop invariants; on a cluster the
  *    deployment note in README "Checkpointed iteration" applies — a
  *    reliable checkpoint dir or an actual table write);
  *  - sessions are held weakly, so a stopped session's entries become
  *    unreachable instead of leaking across ScalaTest suites.
  *
  * Only the (spark, dir) registry wrappers consult the cache. The
  * DataFrame-form operators stay pure so fixture-driven specs exercise
  * the full build every time.
  */
object StageCache {

  private val sessions =
    new java.util.WeakHashMap[SparkSession, mutable.Map[String, DataFrame]]()

  private def canonical(dir: String): String =
    java.nio.file.Paths.get(dir).toAbsolutePath.normalize.toString

  /** Build counter for specs: how many times a `build` thunk actually ran. */
  @volatile private[graft] var builds: Long = 0L

  /** Return the materialized stage, building (and checkpointing) it on
    * first use for this (session, dir, name).
    */
  def materialized(spark: SparkSession, dir: String, name: String)(
      build: => DataFrame): DataFrame = synchronized {
    val perSession =
      sessions.computeIfAbsent(spark, _ => mutable.Map.empty[String, DataFrame])
    perSession.getOrElseUpdate(s"$name|${canonical(dir)}", {
      builds += 1
      build.localCheckpoint(true)
    })
  }

  /** Drop this session's entries and unpersist their checkpoint blocks. */
  def clear(spark: SparkSession): Unit = synchronized {
    Option(sessions.remove(spark)).foreach(_.valuesIterator.foreach { df =>
      try df.queryExecution.toRdd.unpersist(blocking = false)
      catch { case _: Throwable => () }
    })
  }

  def size(spark: SparkSession): Int = synchronized {
    Option(sessions.get(spark)).map(_.size).getOrElse(0)
  }
}
