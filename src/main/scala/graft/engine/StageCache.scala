package graft.engine

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  *    reliable checkpoint dir or an actual table write).
  *
  * Lifetime: entries live until [[clear]] or JVM exit. (A cached
  * DataFrame strongly references its session, so weak-keying the map
  * could never reclaim anything — the map is plainly strong and says
  * so.) As a backstop, every `materialized` call first purges entries
  * whose SparkContext has stopped, so a stopped session's plans don't
  * ride along for the rest of a long JVM.
  *
  * Locking: the map is consulted under the object monitor, but builds
  * run OUTSIDE it under a per-key lock — a minutes-long stage build must
  * not block an unrelated cache hit, and two independent stage builds
  * may proceed in parallel. Only concurrent requests for the SAME key
  * serialize (the loser finds the winner's entry on re-check).
  *
  * Only the (spark, dir) registry wrappers consult the cache. The
  * DataFrame-form operators stay pure so fixture-driven specs exercise
  * the full build every time.
  */
object StageCache {

  private val sessions =
    new java.util.IdentityHashMap[SparkSession, mutable.Map[String, DataFrame]]()
  private val keyLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def canonical(dir: String): String =
    java.nio.file.Paths.get(dir).toAbsolutePath.normalize.toString

  /** Build counter for specs: how many times a `build` thunk actually ran. */
  @volatile private[graft] var builds: Long = 0L

  private def purgeStopped(): Unit = {
    val it = sessions.keySet.iterator()
    val dead = mutable.Buffer.empty[SparkSession]
    while (it.hasNext) {
      val s = it.next()
      if (s.sparkContext.isStopped) dead += s
    }
    dead.foreach(sessions.remove)
  }

  /** Return the materialized stage, building (and checkpointing) it on
    * first use for this (session, dir, name).
    */
  def materialized(spark: SparkSession, dir: String, name: String)(
      build: => DataFrame): DataFrame = {
    val key = s"$name|${canonical(dir)}"
    def lookup(): Option[DataFrame] = synchronized {
      purgeStopped()
      sessions
        .computeIfAbsent(spark, _ => mutable.Map.empty[String, DataFrame])
        .get(key)
    }
    lookup() match {
      case Some(df) => df
      case None =>
        // per-key lock: same-key callers serialize, everyone else runs
        val lock =
          keyLocks.computeIfAbsent(s"${System.identityHashCode(spark)}|$key",
            _ => new Object)
        lock.synchronized {
          lookup() match {
            case Some(df) => df
            case None =>
              val built = build.localCheckpoint(true)
              synchronized {
                builds += 1
                sessions
                  .computeIfAbsent(spark,
                    _ => mutable.Map.empty[String, DataFrame])
                  .update(key, built)
              }
              built
          }
        }
    }
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
