ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "entitylinkinginqueriesmethodsspark"
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
// local-cluster masters (Bench's executor-granularity scaling block) need
// SPARK_HOME in the forked JVM to launch executor processes, and
// SPARK_SCALA_VERSION because outside spark-submit load-spark-env.sh never
// runs and the launcher's getScalaVersion falls into its dev-build path
// ("Cannot find any build directories")
run / envVars += ("SPARK_HOME" -> sys.env.getOrElse("SPARK_HOME", "/opt/spark"))
run / envVars += ("SPARK_SCALA_VERSION" -> "2.13")
// pass the forked JVM's stdout through verbatim instead of routing it via
// the sbt logger: Bench prints its result as one bare JSON line, and the
// "[info] " prefix the logger adds is what kept the driver's log-tail
// parser from reading BENCH_r{2,3} (parsed: null)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// extra JVM opts for experiments (e.g. GC choice) without editing the build
javaOptions ++= sys.env.get("GRAFT_JVM_OPTS").map(_.trim.split("\\s+").toSeq).getOrElse(Seq.empty)
