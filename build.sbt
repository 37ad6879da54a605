ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sressentialsspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run's stdout must reach the console unprefixed: the driver
// parses Bench's single JSON line from stdout, and sbt's default
// LoggedOutput would wrap it as "[info] {...}".
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Test / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Fixed-size, pre-touched heap (r16 — the 48g bimodality diagnosis):
  // with Xms defaulting far below Xmx, G1 oscillates committed heap
  // (grow -> concurrent-cycle uncommit -> regrow) and every regrow
  // re-faults + re-zeroes gigabytes in the kernel — measured 80-98%
  // SYSTEM cpu and 10^5..10^6 page faults/s during sf10 runs, first
  // samples 134-300 s vs 8-20 s once the heap stabilized, with ~4 s of
  // actual GC pauses (GC was NOT the cause). Xms=Xmx stops uncommit;
  // AlwaysPreTouch moves the one-time page zeroing to JVM startup,
  // outside every timed sample. This matches production Spark, which
  // launches executors with Xms=Xmx by design.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
) ++
  // Ad-hoc JVM flags for measurement diagnosis (GC logs, collector
  // A/Bs: e.g. SPARK_GRAFT_JVM_OPTS="-Xlog:gc*:file=/tmp/gc.log").
  // Empty by default so bench protocol runs are unaffected.
  sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq
    .flatMap(_.trim.split("\\s+").toSeq.filter(_.nonEmpty))
