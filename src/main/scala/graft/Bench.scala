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
    // cost and round-over-round comparisons stay honest. Two entries —
    // one per fact family: the TPC-H side (a3) AND the documents side
    // (d_token_counts), so the first d_* query stops paying the
    // documents.parquet footer + text-codegen cost (the r3 d_fingerprint
    // "+46%" was partly this: isolated it times 2.1 s, in-sequence 2.5).
    for (w <- Seq("a3_group_count", "d_token_counts")) {
      try SparkEntry.queries(w)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case scala.util.control.NonFatal(e) =>
        // a broken warmup re-skews the first timed query — say so loudly
        System.err.println(s"[bench] WARMUP ($w) FAILED (timings of the " +
          s"first query will absorb startup cost): ${e.getMessage}")
      }
    }

    // Dev-only isolation filter (SPARK_GRAFT_BENCH_ONLY=q1,q2): lets a
    // single query be timed without its alphabetical neighbors' cache /
    // JIT side effects (used to chase the r3 d_fingerprint drift). The
    // driver never sets it — the contract run times everything.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    // Fail fast on unknown names: a typo would otherwise time an empty
    // selection and overwrite bench_result.json with a 0-query "success".
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names not in SparkEntry.queries: " +
          unknown.mkString(", "))
    }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors  = scala.collection.mutable.LinkedHashMap.empty[String, String]
    selected.foreach { case (name, fn) =>
      // Entry isolation (VERDICT r8 #5): the driver's in-suite timings ran
      // up to 5× the isolated ones (j7 18.5 s vs 3.46) because cached wide
      // tables / broadcasts / localCheckpoint blocks from the preceding
      // ML+dedup block squeeze the storage pool and GC. Clear the SQL
      // cache and let the ContextCleaner reap orphaned checkpoint/broadcast
      // blocks (gc) BEFORE the timed region, so every entry starts from
      // the same storage state it would see in isolation.
      spark.catalog.clearCache()
      // localCheckpoint pins live OUTSIDE the SQL cache: they are
      // persisted RDD blocks that clearCache() never touches, and
      // System.gc() only QUEUES them for the ContextCleaner's async
      // thread — whether they're gone when the timed region starts is a
      // race. That race was the r9 g1_pagerank swing (12.2 s in-suite vs
      // 4.8 s anchored, same plan): the checkpoint-heavy dedup block runs
      // alphabetically just before g1 and its pinned blocks were still
      // squeezing the storage pool. Drop them synchronously — nothing
      // from a finished entry is ever re-read, so a blanket blocking
      // unpersist is safe and makes entry isolation deterministic.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      // Order independence (VERDICT r4 #5): every query — ML fits included
      // since r9 (VERDICT r8 #4: the fits were 143 s of the driver's 288 s
      // and the entire r7→r8 driver-visible regression) — runs twice and
      // the MIN of the two timings is reported — the first pass absorbs
      // whatever position-dependent one-time cost (codegen compile, page
      // cache, broadcast re-use) its alphabetical slot hands it, and min
      // additionally rejects stray GC/JIT hits on either pass (keeping
      // just the second still disagreed 10-40% on sub-second queries
      // across consecutive runs).
      val passes = 2
      var i = 0
      while (i < passes && !errors.contains(name)) {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          val t = (System.nanoTime() - t0) / 1e9
          timings(name) = timings.get(name).fold(t)(math.min(_, t))
        } catch {
          case e: Throwable =>
            timings(name) = (System.nanoTime() - t0) / 1e9
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(1).mkString.take(200)
            System.err.println(s"[bench] $name FAILED: ${errors(name)}")
        }
        i += 1
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
