ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "eventbridgeetlspark"
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
  // whole-stage-codegen class cache (StaticSQLConf, default 100): a
  // 117-query bench generates far more codegen units than 100 between
  // the warmup pass and a query's timed reps, so the LRU evicted every
  // warmup compilation and rep 1 re-paid janino + C2 for code the
  // warmup had already compiled (rep1 jit >> rep2 jit across the
  // suite; 37.8 s total jit rode alongside the r19 baseline's 86 s of
  // walls). Sized to hold the whole suite's units; metaspace cost is
  // a few hundred MB on a 48 g heap box.
  "-Dspark.sql.codegen.cache.maxEntries=5000",
  // local mode = single JVM: driver heap is the only memory knob. 8g
  // caused GC-driven bench variance at sf0.1 with 32 threads + broadcasts.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // pin the committed heap: without -Xms, the System.gc() settle Bench
  // runs between queries shrinks the heap, and the next timed query pays
  // the re-commit (~+0.3-0.4 s on q1_agg at sf0.1 — the round-4 "bench
  // regression" was exactly this, not a plan change)
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
showSuccess := false
// The driver machine-parses Bench's single JSON stdout line. sbt's default
// LoggedOutput wraps the forked JVM's stdout in the "[info] " logger
// prefix, which defeats a strict JSON parse (BENCH_r08..r11 all landed
// parsed: null). StdoutOutput inherits the parent process's stdout
// directly — no logger, no prefix.
run / outputStrategy := Some(StdoutOutput)
