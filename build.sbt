ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "giraphspark"
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
// Route the forked run's stdout straight through instead of via sbt's
// logger: the logger prefixes every line with "[info] ", which is why no
// driver BENCH artifact ever parsed (parsed:null in 14/14 rounds — a
// tail-window JSON scan never sees a line starting with '{'). With
// StdoutOutput the bench's final compact JSON line reaches the driver
// bare. Timed region unaffected: this only changes log plumbing.
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
  // local[32] + a 59-query bench needs real heap: at 8g the back half of
  // the run was GC-bound (2-5x inflation of mid-run queries); codegen
  // for 59 distinct queries also overflows the default 240m JIT code
  // cache, silently dropping hot loops to interpreter speed.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  "-XX:ReservedCodeCacheSize=1g",
)
