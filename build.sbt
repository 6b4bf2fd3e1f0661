ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kafkastreamsjavachallengespark"
// Keep runMain output machine-parseable: Bench prints one JSON line that
// consumers read from the end of stdout; sbt's "[success] Total time"
// trailer would otherwise land after it.
Global / showSuccess := false
// Forked run output goes straight to stdout (no "[info] " line prefix),
// so Bench's JSON line reaches the consumer byte-identical.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// PackagedJarSpec smokes the packaged artifact in a clean JVM — make
// sure every test entry point (test, testOnly, testQuick) always tests
// a FRESH jar, not a stale one: rewiring only the aggregate `test` task
// would let `sbt testOnly graft.PackagedJarSpec` validate old code.
Test / test := (Test / test).dependsOn(Compile / packageBin).value
Test / testOnly := (Test / testOnly).dependsOn(Compile / packageBin).evaluated
Test / testQuick := (Test / testQuick).dependsOn(Compile / packageBin).evaluated
// The spec derives the artifact path from sbt instead of hardcoding the
// versioned filename (a version bump must not break the suite).
Test / javaOptions +=
  s"-Dgraft.packaged.jar=${(Compile / packageBin / artifactPath).value}"
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
