ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nyctaxidatapipelinespark"
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
// Forked program output passes straight through to sbt's own
// stdout/stderr instead of being re-logged with `[info] `/`[error] `
// prefixes. The driver's artifact parser anchors on Bench's
// `{"metric":…}` line at line start — four rounds of `[info] `-
// prefixed output defeated it even when the line was complete.
outputStrategy := Some(StdoutOutput)
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
  // Throughput collector for a batch engine: measured on the
  // text-skew probe's chunked pair expansion (32 threads churning
  // Tungsten pages + partial-agg maps), G1 spent 18-31 s of a 30-50 s
  // max-task in GC pauses; ParallelGC halves the probe wall
  // (78 -> 40 s) and reads at-or-better on every spot-checked catalog
  // query (q356 10.7 -> 8.8 s, q346 8.2 -> 7.5 s). Latency-oriented
  // G1 buys nothing here: no user-facing pause SLO, only throughput.
  "-XX:+UseParallelGC",
// split on runs of whitespace and drop empty tokens: an empty or
// multi-space env value must not inject "" JVM args (launch failure)
) ++ sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq
  .flatMap(_.split("\\s+")).filter(_.nonEmpty)
