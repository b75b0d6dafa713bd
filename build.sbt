ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mycelialspark"
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
// The bench/verify contract is "print ONE JSON line": with the default
// LoggedOutput strategy sbt prefixes every forked-stdout line with
// "[info] ", so a line-oriented JSON parse of the captured output can
// never succeed (r18: a complete compact summary sat in the driver's
// tail as `[info] {...}` and still read as unparseable). StdoutOutput
// passes the forked JVM's stdout through verbatim.
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
  // local[32] with cached frames + streaming state stores needs headroom:
  // an 8g heap showed multi-second GC stalls on the tail queries of a
  // 64-query bench run (st_* swinging 1.3s -> 16s run-to-run)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
// Test fixtures create dozens of Files.createTempDirectory dirs and
// (deliberately) never delete them mid-run; pointing the forked JVM's
// tmpdir at target/ keeps them out of the machine's /tmp — they die
// with `sbt clean` instead of accumulating across rounds (the
// disk-pressure pattern behind r15's bench failures).
Test / javaOptions += {
  val d = target.value / "test-tmp"
  java.nio.file.Files.createDirectories(d.toPath)
  s"-Djava.io.tmpdir=${d.getAbsolutePath}"
}
