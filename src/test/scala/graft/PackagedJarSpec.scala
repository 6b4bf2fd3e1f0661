package graft

import org.scalatest.funsuite.AnyFunSuite

/** The library must be USABLE as a packaged artifact, not just from the
  * sbt classpath: `sbt package`'s jar + the Spark runtime jars must be a
  * complete closure for running registry queries. `sbt test` builds the
  * jar first (Test / test depends on Compile / packageBin in build.sbt);
  * when running this suite alone, `sbt package` must have been run.
  */
class PackagedJarSpec extends AnyFunSuite {

  // Artifact path comes from sbt (build.sbt sets -Dgraft.packaged.jar
  // from Compile/packageBin/artifactPath) so a version bump can't break
  // the suite; the glob fallback covers running the class outside sbt
  // and prefers the NEWEST jar by mtime so a stale older-versioned
  // artifact lying around can't be smoked silently.
  private val jar: java.io.File = sys.props.get("graft.packaged.jar")
    .map(new java.io.File(_))
    .orElse {
      val dir = new java.io.File("target/scala-2.13")
      Option(dir.listFiles()).flatMap(_.filter(f =>
        f.getName.endsWith(".jar") && !f.getName.contains("sources") &&
          !f.getName.contains("javadoc")).sortBy(-_.lastModified()).headOption)
    }
    .getOrElse(new java.io.File("target/scala-2.13/missing.jar"))

  // Environment layout is overridable; defaults match this image.
  private val sparkJarsDir =
    sys.env.getOrElse("SPARK_JARS_DIR", "/opt/spark/jars")
  private val tinySfDir =
    sys.env.getOrElse("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")

  test("sbt package produced the artifact with the public API inside") {
    assert(jar.exists(),
      s"$jar missing — run `sbt package` (sbt test builds it automatically)")
    val jf = new java.util.jar.JarFile(jar)
    try {
      val need = Seq(
        "graft/SparkEntry$.class", "graft/PackagedSmoke$.class",
        "graft/operators/DedupOps$.class", "graft/operators/VectorOps$.class",
        "graft/operators/QuantileSketch$.class",
        "graft/functions/TextFunctions$.class",
        "graft/streaming/UniqueUsersStream$.class")
      val missing = need.filter(jf.getEntry(_) == null)
      assert(missing.isEmpty, s"jar is missing classes: $missing")
      // and no test classes leaked into the artifact
      import scala.jdk.CollectionConverters._
      val leaked = jf.entries().asScala.map(_.getName)
        .filter(n => n.endsWith("Spec.class") || n.contains("scalatest"))
        .take(3).toList
      assert(leaked.isEmpty, s"test classes leaked into the jar: $leaked")
    } finally jf.close()
  }

  test("a clean JVM runs a registry query from the jar + Spark runtime only") {
    assert(jar.exists(), s"$jar missing — run `sbt package` first")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq("java") ++ addOpens ++ Seq(
      "-Dspark.ui.enabled=false", "-Xmx2g",
      "-cp", s"${jar.getPath}:$sparkJarsDir/*",
      "graft.PackagedSmoke", tinySfDir, "q1_agg")
    val out = new StringBuilder
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    var line = reader.readLine()
    while (line != null) { out.append(line).append('\n'); line = reader.readLine() }
    val exit = proc.waitFor()
    assert(exit == 0, s"packaged smoke exited $exit:\n$out")
    val m = "\\[packaged-smoke\\] query=q1_agg rows=(\\d+)".r
      .findFirstMatchIn(out.toString())
    assert(m.exists(_.group(1).toLong > 0),
      s"expected a positive row count from the packaged jar run:\n$out")
  }
}
