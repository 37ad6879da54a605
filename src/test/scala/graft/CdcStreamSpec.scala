package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.engine.ext.{Changelog, Sessionize}
import graft.engine.streaming.CdcStream

/** Streaming CDC upsert: batch-twin convergence under arbitrary
  * batchings, and the watermark-lateness audit's prediction checked
  * against Spark's OWN dropped-row accounting.
  */
class CdcStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val fixtureOps = Seq(
    // op 'D' on every 13th event_id — the tombstone derivation Changelog
    // uses; user 2's final LSN is the tombstone
    CdcStream.CdcOp(user_id = 1L, event_id = 1L, ts_us = 100L,
      event_type = "view", value_c = 10L, op = "U"),
    CdcStream.CdcOp(user_id = 1L, event_id = 2L, ts_us = 200L,
      event_type = "click", value_c = 20L, op = "U"),
    CdcStream.CdcOp(user_id = 2L, event_id = 3L, ts_us = 150L,
      event_type = "view", value_c = 30L, op = "U"),
    CdcStream.CdcOp(user_id = 2L, event_id = 26L, ts_us = 400L,
      event_type = "click", value_c = 60L, op = "D"),
    CdcStream.CdcOp(user_id = 1L, event_id = 20L, ts_us = 300L,
      event_type = "purchase", value_c = 50L, op = "U"),
    CdcStream.CdcOp(user_id = 4L, event_id = 21L, ts_us = 350L,
      event_type = "view", value_c = 70L, op = "U"))

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  private def runCdc(name: String)(feed: MemoryStream[CdcStream.CdcOp] =>
      org.apache.spark.sql.streaming.StreamingQuery => Unit)
      : Seq[(Long, String, String, Long, Long, Long)] = withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CdcStream.CdcOp]
    val q = CdcStream.snapshots(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try feed(mem)(q)
    finally q.stop()
    // final state per key = the Update row with the highest op count
    // (n_ops is monotone per key)
    spark.sql(s"""SELECT user_id, op, event_type, value_c, last_ts_us, n_ops
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |                                   ORDER BY n_ops DESC) rn FROM $name)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
  }

  test("cdc stream converges to the batch fold under different batchings") {
    val oneShot = runCdc("cdc_oneshot") { mem => q =>
      mem.addData(fixtureOps)
      q.processAllAvailable()
    }
    val perOp = runCdc("cdc_perop") { mem => q =>
      fixtureOps.foreach { op => mem.addData(op); q.processAllAvailable() }
    }
    val batch = Changelog.state(
      fixtureOps.toDF().withColumnRenamed("value_c", "vc")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("event_type"), col("vc").as("value_c"), col("op")))
      .orderBy(col("user_id"))
      .select("user_id", "op", "event_type", "value_c", "last_ts_us", "n_ops")
      .as[(Long, String, String, Long, Long, Long)].collect().toSeq
    assert(oneShot === batch)
    assert(perOp === batch)
    // tombstoned key is visible with op=D (reader filters), not absent
    assert(oneShot.find(_._1 == 2L).exists(_._2 == "D"))
  }

  test("lateness audit predicts Spark's numRowsDroppedByWatermark exactly") {
    import graft.engine.streaming.EventStream.UserEvent
    val s = 1000000L
    // same fixture as the batch audit spec: arrival order with event
    // times 100s, 30s, 95s, 200s on one ingest partition
    val times = Seq(100L, 30L, 95L, 200L)
    val auditEv = times.zipWithIndex
      .map { case (t, i) => (1L + 8L * i, 1L, t * s) }
      .toDF("event_id", "user_id", "ts_us")
    val predicted = Sessionize.latenessAudit(auditEv)
      .select("delay_us", "n_late").as[(Long, Long)].collect().toMap

    def droppedAt(delay: String): Long = withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[UserEvent]
      // 1-second windows on integer-second fixtures: the aggregation
      // drops a row iff its WINDOW END ≤ watermark, and with a 1 s
      // window that is exactly `ts < max_prev − delay` — the audit's
      // event-level criterion (a coarser window would mask late events
      // whose window still straddles the watermark)
      val q = mem.toDF()
        .withWatermark("event_time", delay)
        .groupBy(window(col("event_time"), "1 second"))
        .count()
        .writeStream.format("memory").queryName(s"wm_${delay.hashCode.abs}")
        .outputMode("append").start()
      try {
        times.foreach { t =>
          mem.addData(UserEvent(1L, new java.sql.Timestamp(t * 1000), 1.0))
          q.processAllAvailable()
        }
        q.recentProgress.flatMap(_.stateOperators)
          .map(_.numRowsDroppedByWatermark).sum
      } finally q.stop()
    }

    // one event per micro-batch on one partition makes Spark's
    // batch-boundary watermark coincide with the audit's running-max
    // model: a row sets (or trails) the max exactly as in the batch sweep
    assert(droppedAt("60 seconds") === predicted(60 * s))
    assert(droppedAt("0 seconds") === predicted(0L))
    assert(predicted(60 * s) === 1L && predicted(0L) === 2L)
  }
}
