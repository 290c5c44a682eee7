ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "binancefuturesavailabilityspark"
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
// The driver parses the LAST stdout line of `sbt runMain graft.Bench` as
// JSON. Two sbt behaviors used to break that: the default output strategy
// wraps the forked JVM's stdout in `[info] ` logger lines, and sbt appends
// a `[success] Total time: ...` trailer after the run. Pass the forked
// process's streams through untouched and drop the trailer, so the bench
// summary JSON is genuinely the final line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// outputStrategy trips sbt's unused-key lint (it IS read by the forked
// runner); the lint note itself would otherwise print above the bench
// output.
Global / excludeLintKeys ++= Set(outputStrategy, showSuccess)
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
  // local mode = driver-only JVM. Keep the heap MODEST: on this
  // virtualized host a large heap (48g+) makes G1 grow the young gen and
  // every fresh-page touch costs a slow host page fault — measured 4-17x
  // uniform slowdown on allocation-heavy stages vs an 8-12g heap.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  // Whole-stage codegen emits one class per stage; across a ~50-query
  // session the default 240m JIT code cache fills and HotSpot silently
  // stops compiling — late queries ran 5x slower until this was raised.
  "-XX:ReservedCodeCacheSize=1g",
)
