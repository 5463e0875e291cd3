ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "customer_churn_predictionspark"
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
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Heap sizing (r13): pin Xms=Xmx and pre-touch so the committed heap
// never resizes. The floating default used to let G1 uncommit after
// every full GC and re-fault pages under 32 threads mid-query — on a
// shared host that page-commit churn showed up as 80%+ sys-time bursts
// and a GC-bound tail (g2_triangles: 22.5 s GC in its worst in-suite
// run; <1.3 s across every run with this config). The DEFAULT is
// derived from host RAM (r14, de-hosted): min(16g, MemTotal/4), floor
// 2g — on the 128 GiB driver box that is exactly the r13 16g (the
// graph and ML families' ~5-7 GB live sets keep old-gen headroom), and
// on a smaller host the pre-touched pin no longer aborts JVM start.
// SPARK_DRIVER_MEM still overrides outright. ParallelGCThreads capped
// at min(16, cores) (default would be 23 at 32 CPUs) so a
// host-preempted GC doesn't collapse into kernel spin-waiting.
val driverMem = sys.env.getOrElse("SPARK_DRIVER_MEM", {
  val memTotalKb =
    try scala.io.Source.fromFile("/proc/meminfo").getLines()
      .collectFirst { case l if l.startsWith("MemTotal:") =>
        l.split("\\s+")(1).toLong }
      .getOrElse(0L)
    catch { case _: Exception => 0L }
  val gb = math.max(2L, math.min(16L, memTotalKb / (4L * 1024 * 1024)))
  s"${gb}g"
})
// (fully qualified: bare `Runtime` in a build.sbt is sbt's Runtime config)
val gcThreads =
  math.min(16, java.lang.Runtime.getRuntime.availableProcessors)
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverMem", s"-Xms$driverMem",
  "-XX:+AlwaysPreTouch", s"-XX:ParallelGCThreads=$gcThreads",
)
