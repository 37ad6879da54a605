package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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

    // Does an EAGER localCheckpoint complete an Observation? (The CC loop
    // rides fingerprints on the checkpoint job — a hang here means the
    // listener never fires for the checkpoint action.)
    val obs = org.apache.spark.sql.Observation()
    val df = Seq((1L, 2L), (3L, 4L)).toDF("u", "v")
      .observe(obs, count(lit(1)).as("n"),
        sum(pmod(xxhash64(col("u"), col("v")), lit(1048573L))).as("h"))
    val ck = df.localCheckpoint(true)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    try {
      val m = Await.result(Future(obs.get), 15.seconds)
      println(s"[probe] observation after eager localCheckpoint: $m")
    } catch {
      case _: java.util.concurrent.TimeoutException =>
        println("[probe] observation TIMED OUT — listener never fired")
    }
    println(s"[probe] ck rows=${ck.count()}")
    spark.stop()
  }
}
