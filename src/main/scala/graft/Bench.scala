package graft

import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR.
  *
  * Contract (round-1 fixes baked in):
  *  - SAME session config as Verify ([[Sessions.local]]) — no more
  *    config-drift crashes;
  *  - per-query failures are RECORDED (errors map) and fail the run
  *    (nonzero exit), never silently timed as successes;
  *  - the metric JSON is the FINAL line on stdout and also written to
  *    bench_result.json so the driver can parse it past sbt noise.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-bench")

    // Untimed warmup: absorb JVM/codegen/parquet-footer startup so the
    // first alphabetical timed entry stops carrying ~6 s of one-time
    // cost and round-over-round comparisons stay honest.
    try SparkEntry.queries("a3_group_count")(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    catch { case scala.util.control.NonFatal(e) =>
      // a broken warmup re-skews the first timed query — say so loudly
      System.err.println(s"[bench] WARMUP FAILED (timings of the first " +
        s"query will absorb startup cost): ${e.getMessage}")
    }

    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors  = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        timings(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          timings(name) = (System.nanoTime() - t0) / 1e9
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(1).mkString.take(200)
          System.err.println(s"[bench] $name FAILED: ${errors(name)}")
      }
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = timings.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = timings.values.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"n_ok":${timings.size - errors.size},"n_err":${errors.size},"sf":${jstr(sfDir)}}"""

    Files.writeString(Paths.get("bench_result.json"), json)
    spark.stop()
    // Final clean stdout line — the driver greps for it.
    println(json)
    if (errors.nonEmpty) sys.exit(1)
  }
}
