ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "new_data_pipelinespark"
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
// The bench/verify contract is "driver parses the LAST bytes of stdout
// as JSON". sbt's default LoggedOutput strategy re-logs the forked
// JVM's stdout line-by-line with an "[info] " prefix and collapses the
// newline padding (BENCH_r07.json preserves the mangled tail), and then
// appends its own "[success] Total time..." line AFTER the JSON.
// StdoutOutput hands the forked process the real stdout fd (raw
// passthrough), and showSuccess := false drops the epilogue, so the
// bench's shutdown-hook summary is the literal last stdout content.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // local mode = one JVM; heap is the only memory knob that matters.
  // 32g leaves ample room for shingle/label caches at sf0.1 on a 128g box.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // dozens of queries x reps generate hundreds of Janino codegen classes;
  // the JDK default 240m code cache fills mid-run and the JIT silently
  // stops compiling — late queries then run interpreted at 5-20x cost
  "-XX:ReservedCodeCacheSize=1g",
) ++ sys.env.get("SPARK_GRAFT_GCLOG").map(f => s"-Xlog:gc:file=$f").toSeq ++
  // dev knob: extra JVM flags for forked runs (JIT/GC experiments)
  sys.env.get("SPARK_GRAFT_XOPTS").map(_.split(" ").toSeq).getOrElse(Seq.empty)
