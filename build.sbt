ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "distributedwebcrawlingprojectmainspark"
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
// single-token --add-opens=… form: a two-token "--add-opens <module>"
// pair in the forked JVM's argv trips any argv re-parser (Bench's
// pinned-child re-exec scans /proc/self/cmdline) and is the form under
// which a bare trailing "--add-opens" kills the child JVM outright
).map(p => s"--add-opens=$p=ALL-UNNAMED")
// Default heap scales to the machine: min(32g, half of physical RAM).
// SPARK_DRIVER_MEM/SPARK_DRIVER_YOUNG override (the bench harness sets
// them); a fixed 32g default would get the JVM OOM-killed on small hosts.
val defaultHeapGb: Int = {
  val physGb = try {
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    (os.getTotalMemorySize / (1L << 30)).toInt
  } catch { case _: Throwable => 16 }
  math.max(2, math.min(32, physGb / 2))
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", s"${defaultHeapGb}g")}",
  // batch-throughput GC: the engine's hot paths (span parse, URL
  // canonicalize, shuffle rows) are allocation-heavy; parallel scavenge
  // with a large young gen beats G1 pause-targeting for this profile
  "-XX:+UseParallelGC",
  s"-Xmn${sys.env.getOrElse("SPARK_DRIVER_YOUNG", s"${math.max(1, defaultHeapGb * 3 / 8)}g")}",
)
