ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "udatadatalakeservicespark"
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
// The suite is 194 sequential Spark-heavy specs (~43 min of summed test
// time on this box) in ONE forked local[4] JVM — wall time ~55 min, which
// overflows the round driver's sbt-test window (round 13 verdict item 2).
// Split the suites across SPARK_GRAFT_TEST_FORKS (default 4) forked JVMs
// running in parallel: each group is fully isolated (own SparkSession,
// own local[4] scheduler, own heap), so no shared-session conf mutation,
// plan-capture flag or cacheManager cross-talk is possible — unlike
// in-process suite parallelism, which would race on all three. Suites are
// snake-distributed by name so alphabetical clusters of heavy suites
// (Streaming*) spread across groups. SPARK_GRAFT_TEST_FORKS=1 restores
// the single sequential JVM.
val testForks = math.max(1, sys.env.getOrElse("SPARK_GRAFT_TEST_FORKS", "4").toInt)
Test / testGrouping := {
  val tests = (Test / definedTests).value.sortBy(_.name)
  val opts = (Test / javaOptions).value.toVector
  val builders = Array.fill(testForks)(Vector.newBuilder[TestDefinition])
  tests.zipWithIndex.foreach { case (t, i) =>
    val round = i / testForks
    val pos = i % testForks
    val g = if (round % 2 == 0) pos else testForks - 1 - pos
    builders(g) += t
  }
  builders.map(_.result()).zipWithIndex.toSeq.collect { case (ts, i) if ts.nonEmpty =>
    Tests.Group(s"fork$i", ts,
      Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testForks),
  Tags.limitAll(math.max(32, testForks)))
// Pipe forked run output STRAIGHT to stdout (no "[info] " logger prefix):
// the round driver parses Bench's single BENCH_JSON line from column 0,
// and the logger prefix is what kept breaking that parse.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// (`runMain` shares `run / runner`, so the two keys above cover it too —
// sbt's lintUnused flags runMain-scoped copies as dead settings.)
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
