ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "recommandationdefilmsjayzentertainmentintgrationdebigdataetiaspark"
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
// Parallel test JVMs (r20 — VERDICT r19 #2): the serial forked suite runs
// ~18-20 min wall, which is past the driver's test budget (its r19 record
// cut off mid-suite with no ScalaTest summary). One forked JVM PER SUITE,
// several in flight: suites are isolated by process (each gets its own
// SparkSession, so the listener/job-counting tests stay exact), and each
// JVM gets a PRIVATE warehouse dir so same-named tables in two suites
// cannot collide on disk. Concurrency 5 × local[4] sessions ≈ 20 busy
// cores; wall collapses to roughly the longest single suite.
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  (Test / definedTests).value.map { t =>
    val wh = java.nio.file.Files.createTempDirectory("graft-test-wh").toString
    Tests.Group(t.name, Seq(t), Tests.SubProcess(
      ForkOptions().withRunJVMOptions(opts ++ Vector(
        s"-Dspark.sql.warehouse.dir=$wh",
        s"-Dderby.system.home=$wh"))))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 5),
  Tags.limitAll(15))
// Bench/Verify print a machine-read JSON line; route the forked JVM's
// stdout straight through (no "[info] " prefix, which breaks the
// driver's JSON parse — BENCH_r01/r02 both recorded parsed:null).
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
  // Xms pinned to Xmx: with a large heap and per-query System.gc()
  // (Bench hygiene), G1 otherwise uncommits tens of GB after each full
  // GC and re-faults it in the kernel on the next query — measured as
  // multi-core SYSTEM-time storms that turned q120's steady 21 s into
  // bimodal 60–140 s walls with byte-identical plans (the r14→r15
  // "regression" was exactly this). A committed heap never shrinks, so
  // the churn class is gone.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
