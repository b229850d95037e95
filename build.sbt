ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hudianddeltashowcasespark"
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
// Pass the forked program's stdout/stderr through RAW (no sbt `[info]`
// prefix): the bench driver parses Bench's one-line JSON from stdout, and
// the logger prefix broke that parse (BENCH_r04.json "parsed": null).
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Spark whole-stage codegen churns the JIT code cache hard in a
  // long-lived JVM (one bench/verify process compiles hundreds of
  // generated classes); at the JDK17 default (240m) the cache can fill
  // mid-suite, the JIT stops compiling until the flusher catches up, and
  // whole query blocks run interpreted (the round-5 bench tail). Reserve
  // enough that compilation never pauses.
  "-XX:ReservedCodeCacheSize=1g",
  // With a large -Xmx (the bench protocol runs 100g) G1's adaptive young
  // gen balloons to tens of GB: garbage from scan-heavy queries then
  // accumulates for whole query blocks with ZERO collections, RSS climbs
  // past 30 GB, and the box degrades until a collection finally fires —
  // measured as a progressive 2-10x slowdown on the scan-heaviest bench
  // entries (e13/e14 repeated searches: reps 1-7 ~1.5s, reps 8-14 10-20s,
  // instant recovery after the first GC; graft.tools.VixProbe reproduces
  // it). Capping the young gen keeps collections frequent (tens of ms,
  // small live set) and RSS bounded, and the same probe then holds ~1.5s
  // across all reps.
  "-XX:MaxNewSize=2g",
) ++ sys.env.get("GRAFT_EXTRA_JVM").toSeq
  .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
