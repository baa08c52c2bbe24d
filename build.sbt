ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "concordiumtransactionloggerspark"
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
// Forked run output goes straight to stdout (no "[info] " prefix) so the
// driver can parse Bench's single JSON line from captured output.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// The driver parses Bench's JSON from a bounded tail of captured stdout;
// sbt's trailing "[success] Total time: …" line would eat that budget.
Global / showSuccess := false
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
  // 16g default (r21, was 8g): the sandbox has 128 GiB and at most two
  // JVMs alive at once (sbt parent + one bench shard child), and GC
  // debt inside a ~25-query shard is the documented first-reading
  // inflator (r15: cns 29 s vs 3.8 s; r20 rerun object: mvd 7.4→5.0).
  // Doubling the heap halves the collection frequency at the same
  // allocation rate. Still env-parameterised for smaller hosts.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // Pre-size the heap: with the default tiny -Xms, the first
  // memory-hungry query in each bench shard pays the whole heap
  // expansion in full-GC pauses (r15 sweep: cns 29 s first reading vs
  // 3.8 s re-run on a grown heap). Bench shard children inherit this
  // via the parent's RuntimeMXBean args.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
