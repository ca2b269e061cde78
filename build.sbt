ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sales_data_pipelinespark"
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
// Forked run output must reach stdout raw (no [info] prefix) — the bench
// driver parses the JSON line from stdout.
run / outputStrategy := Some(StdoutOutput)
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
  // 24g default: local[32] runs 32 concurrent tasks in ONE JVM — at 8g the
  // dedup/embedding family GC-thrashed (2-3× run-to-run variance at sf0.1)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // A 200-query catalog generates well over a thousand whole-stage-codegen
  // units per bench pass. The JVM's 240 MB default JIT code cache fills,
  // the compiler shuts off, and everything runs interpreted — the r7 bench
  // showed exactly that shape (uniform 1.7× slowdown, 10-30× outliers, on
  // code unchanged since r6). Give the JIT headroom and keep flushing on.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
  // Static SQL conf (must be set before the first SparkSession): the
  // default 100-entry codegen source→class cache thrashes long before 200
  // queries; eviction forces recompiles in the measured run and pins churn.
  "-Dspark.sql.codegen.cache.maxEntries=2000",
)
