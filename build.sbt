ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "daasappsspark"
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
// Forked run output defaults to LoggedOutput, which prefixes every line
// with "[info] " — that prefix broke the driver's JSON parse of the
// Bench stdout line three rounds running (BENCH_r07–r09 `parsed: null`).
// StdoutOutput inherits sbt's real stdout at the fd level: bare lines.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// The driver keeps only a ~2 kB TAIL of stdout; at 185 bench rows the
// compact JSON line is ~1990 bytes, and sbt's trailing "[success]
// Total time: ..." (~60 bytes) would push the line's OPENING BRACE out
// of the window. Success is still signaled by exit code 0.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // extra JVM flags for diagnosis runs (GC logs, code-cache sizing) —
  // e.g. SPARK_EXTRA_JVM="-Xlog:gc:file=/tmp/gc.log"
) ++ sys.env.get("SPARK_EXTRA_JVM").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
