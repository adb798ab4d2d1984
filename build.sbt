ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "blockexplorerspark"
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
// The driver parses `sbt "runMain graft.Bench"` stdout for the bench's
// one-line JSON (it has read `parsed: null` since r11): route the forked
// JVM's output STRAIGHT to stdout instead of through sbt's logger (which
// prefixes every line with "[info] "), and drop the trailing
// "[success] Total time..." banner so the JSON line is the final stdout
// line with no prefix and nothing after it.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
  // A long-lived session compiles thousands of Janino-generated classes;
  // the JVM default 240m code cache fills mid-session, after which the
  // JIT disables itself and EVERYTHING late in the session runs
  // interpreted (the roving 4-10x warm-pass slowdown signature).
  "-XX:ReservedCodeCacheSize=512m",
  // Spark's codegen class cache defaults to 100 entries — smaller than
  // one catalog pass' stage count, so every pass recompiles every stage.
  "-Dspark.sql.codegen.cache.maxEntries=3000",
)
// Ad-hoc JVM flags for the forked runs (diagnostics: -Xlog:safepoint,
// GC logging, JFR) — the JVM-level twin of the SPARK_GRAFT_CONF overlay,
// so measurement experiments never need a build edit.
javaOptions ++= sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq
  .flatMap(_.trim.split("\\s+").toSeq).filter(_.nonEmpty)
