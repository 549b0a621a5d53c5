ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "geneticalgorithmsusingmapreducespark"
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
// Hand the forked JVM's stdout through UNWRAPPED: sbt's default logger
// prefixes every line with "[info] ", which breaks machine consumers
// that parse Bench/Verify's single JSON output line from stdout
// (driver round 1 recorded bench "parsed": null for exactly this).
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Throughput collector for single-JVM batch runs: at the GA
  // headline scale (2.1 GB of genome rows churning per generation)
  // JDK 17's default G1 measured 32-41 s/gen on a quiet host while
  // ParallelGC measured 13-16 s/gen (round-12 A/B, BASELINE.md) —
  // G1's concurrent marking + region evacuation fights 32 mutator
  // threads for exactly the memory bandwidth the job needs. Batch
  // analytics has no pause-time SLO, so the throughput collector is
  // the right default for every forked run here.
  "-XX:+UseParallelGC",
)
