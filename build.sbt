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
// run; <1.3 s across every run with this config). 16g gives the graph
// and ML families' ~5-7 GB live sets old-gen headroom on the 128 GiB
// box; ParallelGCThreads capped at 16 (default 23 at 32 CPUs) so a
// host-preempted GC doesn't collapse into kernel spin-waiting.
val driverMem = sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverMem", s"-Xms$driverMem",
  "-XX:+AlwaysPreTouch", "-XX:ParallelGCThreads=16",
)
