ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "detanalysisspark"
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
// Pass forked `run` output through RAW: sbt's default LoggedOutput
// prefixes every line with "[info] ", which breaks line-oriented JSON
// parsing of Bench's headline line downstream (BENCH_r05 `parsed: null`
// — the line was present in the tail but prefixed).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
// NOTE (r12): capping GC/JIT background threads
// (ParallelGCThreads=8, ConcGCThreads=2, CICompilerCount=4) was tried
// as a bench-stability lever and MEASURED COUNTERPRODUCTIVE: with only
// 4 compiler threads the JIT needs most of a 7-run series to reach
// steady state (monotone per-query drift, e.g. 0.46→0.17 s), and the
// drift — not ambient load — tripped the noise gate. The fix lives in
// Bench's measurement protocol (extended warm-up discard), not here.
