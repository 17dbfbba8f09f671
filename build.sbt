ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kafkacdchudispark"
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
// Pass the forked process's stdout/stderr straight through instead of
// re-logging them with [info]/[error] prefixes: the round driver parses
// graft.Bench's one-line JSON off the stdout tail, and the logger
// prefix made BENCH_r14/r15.json rc=0 but parsed:null.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and keep sbt from appending "[success] Total time" AFTER the fork
// exits, so the bench's one-line JSON is the process's final stdout line
ThisBuild / showSuccess := false
Global / excludeLintKeys += showSuccess
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
  // 24g default on the 128 GiB host: 16g left the heavy ANN queries one
  // major GC away from a 2x rep-time spike in bench forks (observed as
  // isolated 10s reps amid 4s neighbors); override with SPARK_DRIVER_MEM
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
) ++ sys.env.get("GRAFT_GC_LOG").map(p => s"-Xlog:gc*:file=$p:time,uptime").toSeq
