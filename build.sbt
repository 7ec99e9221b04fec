ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "aim3572019etlandmlworkshopspark"
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
// Suites run CONCURRENTLY inside the forked test JVM: per-suite
// SparkSessions are isolated views of one shared context (see
// SparkSpec), so the suite-parallel wall time is bounded by the
// slowest suite instead of the 25-minute sequential sum the driver's
// test gate timed out on.
Test / testForkedParallel := true
// per-test durations in the report — finding the suite-parallel
// critical path needs them
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
// BenchControlSpec pins Bench.clearStorage, which unpersists EVERY
// RDD on its context — including other suites' localCheckpoint blocks
// (lineage-truncated: dropping them mid-flight fails those suites'
// jobs, not just slows them). It gets its own forked JVM/context; the
// two groups run concurrently (ForkedTestGroup limit below).
Test / testGrouping := {
  val opts = ForkOptions().withRunJVMOptions((Test / javaOptions).value.toVector)
  val (iso, rest) = (Test / definedTests).value
    .partition(_.name == "graft.BenchControlSpec")
  Seq(
    Tests.Group("main", rest, Tests.SubProcess(opts)),
    Tests.Group("storage-sweeping", iso, Tests.SubProcess(opts)))
}
// sbt's default restriction pins ForkedTestGroup at 1 and restriction
// sets combine as a minimum, so the default must be REPLACED, not
// appended to, for the two groups to overlap.
Global / concurrentRestrictions := Seq(
  Tags.limitAll(java.lang.Runtime.getRuntime.availableProcessors()),
  Tags.limit(Tags.ForkedTestGroup, 2))
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
)
