ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hadoopdistexecspark"
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
// Forked `run` output goes straight to stdout, NOT through sbt's logger:
// the bench/verify mains emit machine-parsed JSON lines that must not be
// "[info]"-prefixed (round-1 driver parse failure).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// The bench driver keeps only the last 2000 chars of stdout and parses
// that tail as JSON; sbt's "[success] Total time: …" footer after the
// bench's final JSON line broke that parse every round. Suppress both.
Global / showSuccess := false
Global / showTiming := false
// (command-consumed keys — excluded from sbt's unused-setting lint)
Global / excludeLintKeys ++= Set(showSuccess, showTiming)
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
  // 32g max heap (the box has 128 GiB; -Xmx is a ceiling, not a
  // reservation). The old 8g default starved ~unique-key partial
  // aggregates on data-sized legs into Spark's sort-based fallback
  // while the DuckDB comparator ran under its default memory_limit of
  // 80% of RAM: d22's level-1 histogram at the 100x replicas measured
  // 17.7 s at 8g vs 13.5 s at 32g (ScanShapeAb d22int, medians of 3)
  // — the 10x->100x step drops from ~11x to a sublinear 8.4x for 10x
  // rows. At sf0.1 the heap never grows past a few GiB either way.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
