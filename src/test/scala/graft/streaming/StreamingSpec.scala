package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.llm.EventWindows

/** Batch ≡ stream parity on a finite events directory. */
class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val dir: String = {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.5, "{}"),
      (2L, ts("2024-01-01 10:20:00"), 1L, "click", 2.25, "{}"),
      (3L, ts("2024-01-01 10:40:00"), 1L, "view", 3.0, "{}"),
      (4L, ts("2024-01-01 11:30:00"), 1L, "click", 4.0, "{}"),
      (5L, ts("2024-01-01 09:59:00"), 2L, "view", 5.5, "{}"),
      (6L, ts("2024-01-01 12:10:00"), 2L, "purchase", 6.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val d = Files.createTempDirectory("stream-spec").toString
    events.repartition(3).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("streaming tumbling windows equal the batch spelling on finite input") {
    import spark.implicits._
    val stream = StreamingWindows.readEventStream(spark, s"$dir/events.parquet")
    val got = StreamingWindows.runToCompletion(spark,
        StreamingWindows.tumbling(stream), "t_tumbling", OutputMode.Complete())
      .orderBy($"w_start", $"event_type")
      .as[(Timestamp, Timestamp, String, Long, Double)].collect().toSeq
    val want = EventWindows.queries("ev_tumbling")(spark, dir)
      .orderBy($"w_start", $"event_type")
      .as[(Timestamp, Timestamp, String, Long, Double)].collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("streaming sliding windows equal the batch spelling on finite input") {
    import spark.implicits._
    val stream = StreamingWindows.readEventStream(spark, s"$dir/events.parquet")
    val got = StreamingWindows.runToCompletion(spark,
        StreamingWindows.sliding(stream), "t_sliding", OutputMode.Complete())
      .orderBy($"w_start", $"event_type")
      .as[(Timestamp, Timestamp, String, Long, Double)].collect().toSeq
    val want = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select($"window.start".as("w_start"), $"window.end".as("w_end"),
        $"event_type", $"n", $"sum_value")
      .orderBy($"w_start", $"event_type")
      .as[(Timestamp, Timestamp, String, Long, Double)].collect().toSeq
    assert(got == want && got.nonEmpty)
    // every event sits in exactly 4 windows: total n = 4 × input rows
    assert(got.map(_._4).sum == 4L * 6)
  }

  test("streaming session windows equal the batch spelling on finite input") {
    import spark.implicits._
    val stream = StreamingWindows.readEventStream(spark, s"$dir/events.parquet")
    // watermark must cover the test input's disorder: micro-batches are
    // per-file and files are not event-time ordered
    val got = StreamingWindows.runToCompletion(spark,
        StreamingWindows.session(stream, delay = "1 day"), "t_session", OutputMode.Complete())
      .orderBy($"user_id", $"s_start")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSeq
    val want = EventWindows.queries("ev_session")(spark, dir)
      .orderBy($"user_id", $"s_start")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("quality filter runs identically as a readStream stage (map-only parity)") {
    import spark.implicits._
    val docs = Seq(
      (0L, ("the quick brown fox jumps over a lazy dog and " * 3).trim, "en", "s0", 100L),
      (1L, "too short", "en", "s1", 9L),
      (2L, ("spam " * 40).trim, "en", "s2", 200L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = Files.createTempDirectory("stream-docs").toString
    docs.repartition(2).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val schema = spark.read.parquet(s"$d/documents.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(s"$d/documents.parquet")
    val got = StreamingWindows.runToCompletion(spark,
        graft.llm.TextOps.qualityFilterOf(stream), "t_quality", OutputMode.Append())
      .orderBy($"doc_id").as[(Long, Int, String)].collect().toSeq
    val want = graft.llm.TextOps.qualityFilterOf(spark.read.parquet(s"$d/documents.parquet"))
      .orderBy($"doc_id").as[(Long, Int, String)].collect().toSeq
    assert(got == want && got.nonEmpty)
    assert(want.map(_._3).toSet.size >= 2) // exercises >1 rule outcome
  }

  test("streaming exact dedup by key drops re-deliveries across micro-batches") {
    import spark.implicits._
    // duplicate event_ids in a second directory of files
    val dupDir = Files.createTempDirectory("stream-dup").toString
    val dup = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.5, "{}"),
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.5, "{}"), // same batch dup
      (2L, ts("2024-01-01 10:20:00"), 1L, "click", 2.25, "{}"),
      (7L, ts("2024-01-01 13:00:00"), 3L, "view", 9.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    dup.repartition(2).write.mode("overwrite").parquet(s"$dupDir/events.parquet")

    val stream = StreamingWindows.readEventStream(spark, s"$dupDir/events.parquet")
      .dropDuplicates("event_id")
    val got = StreamingWindows.runToCompletion(spark, stream, "t_dedup",
        OutputMode.Append())
      .select($"event_id").as[Long].collect().toSeq.sorted
    assert(got == Seq(1L, 2L, 7L))
  }

  test("watermark-bounded streaming dedup drops re-deliveries within the delay") {
    import spark.implicits._
    // same dup layout as above, but via the state-bounded production
    // spelling: state per key is evicted once the watermark passes
    // ts + delay, so the test's delay must cover the input's span
    // (finite-replay parity, same caveat as the session-window test).
    val dupDir = Files.createTempDirectory("stream-dup-wm").toString
    val dup = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.5, "{}"),
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.5, "{}"),
      (2L, ts("2024-01-01 10:20:00"), 1L, "click", 2.25, "{}"),
      (2L, ts("2024-01-01 10:20:00"), 1L, "click", 2.25, "{}"),
      (7L, ts("2024-01-01 13:00:00"), 3L, "view", 9.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    dup.repartition(3).write.mode("overwrite").parquet(s"$dupDir/events.parquet")

    val stream = StreamingWindows.dedupWithinWatermark(
      StreamingWindows.readEventStream(spark, s"$dupDir/events.parquet"),
      delay = "1 day")
    val got = StreamingWindows.runToCompletion(spark, stream, "t_dedup_wm",
        OutputMode.Append())
      .select($"event_id").as[Long].collect().toSeq.sorted
    assert(got == Seq(1L, 2L, 7L))
  }

  test("stream-stream interval join equals the batch binned range join") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    // stage into a directory: FileStreamSource requires a dir basePath
    val staged = Files.createTempDirectory("stream-ss").toString
    graft.Tables.load(spark, sf, "events")
      .repartition(3).write.mode("overwrite").parquet(s"$staged/events.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$staged/events.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$staged/events.parquet")
    val joined = StreamingWindows.streamStreamRangeJoin(
      stream.filter($"event_type" === "purchase"),
      stream.filter($"event_type" === "view"),
      lagHours = 12, delay = "31 days") // finite replay: cover full disorder
    val got = StreamingWindows.runToCompletion(spark, joined, "t_ssjoin",
        OutputMode.Append())
      .select($"p_id", $"v_id").as[(Long, Long)].collect().sorted.toSeq

    val ev = graft.Tables.load(spark, sf, "events")
    val want = graft.llm.TemporalJoins.boundedRangeJoin(
        ev.filter($"event_type" === "purchase")
          .select($"event_id".as("p_id"), $"user_id", $"ts"),
        ev.filter($"event_type" === "view")
          .select($"event_id", $"user_id", $"ts", $"value"),
        Seq("user_id"), "ts", "ts", lagSeconds = 12L * 3600)
      .select($"p_id", $"r_event_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got == want && got.nonEmpty)
  }

  test("declared st_enrich equals the batch left join; unknown users pass through with nulls") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("st_enrich")(spark, sf)
      .select($"event_id", $"c_name", $"c_mktsegment")
      .as[(Long, Option[String], Option[String])].collect().sorted.toSeq
    val ev = graft.Tables.load(spark, sf, "events")
    val dim = graft.Tables.load(spark, sf, "customer")
      .select($"c_custkey".as("user_id"), $"c_name", $"c_mktsegment")
    val want = ev.join(dim, Seq("user_id"), "left_outer")
      .select($"event_id", $"c_name", $"c_mktsegment")
      .as[(Long, Option[String], Option[String])].collect().sorted.toSeq
    assert(got == want && got.nonEmpty)
  }

  test("declared st_range_join equals the declared batch ev_range_join") {
    import spark.implicits._
    // The single-data-batch drain must emit exactly the batch range
    // join's pairs (inner stream-stream joins emit on match; nothing
    // waits on or is dropped by the watermark when all input arrives in
    // batch 1) — the contract the DuckDB oracle spells.
    val sf = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("st_range_join")(spark, sf)
      .select($"p_id", $"v_id").as[(Long, Long)].collect().sorted.toSeq
    val want = graft.SparkEntry.queries("ev_range_join")(spark, sf)
      .select($"p_id", $"v_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got == want && got.nonEmpty)
  }

  test("declared st_left_join: inner pairs plus watermark-evicted null-extended purchases") {
    import spark.implicits._
    // The outer join's contract has two halves: (1) the matched pairs
    // are exactly the batch range join's (emitted on match, same as
    // st_range_join); (2) a null-extended purchase emits iff it has no
    // qualifying view AND its event time sits strictly below the final
    // global watermark — min of the two sides' ms-floored max event
    // times minus the 1 h delay. Purchases at/above the boundary are
    // withheld (still matchable in a continuous run).
    val sf = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("st_left_join")(spark, sf)
    val inner = got.filter($"v_id".isNotNull)
      .select($"p_id", $"v_id").as[(Long, Long)].collect().sorted.toSeq
    val innerWant = graft.SparkEntry.queries("ev_range_join")(spark, sf)
      .select($"p_id", $"v_id").as[(Long, Long)].collect().sorted.toSeq
    val evictedGot = got.filter($"v_id".isNull)
      .select($"p_id").as[Long].collect().sorted.toSeq

    val ev = graft.Tables.load(spark, sf, "events")
    val p = ev.filter($"event_type" === "purchase")
    val v = ev.filter($"event_type" === "view")
    def maxMs(side: org.apache.spark.sql.DataFrame): Long =
      side.agg(max(expr("unix_micros(ts) div 1000"))).head().getLong(0)
    val wmMs = math.min(maxMs(p), maxMs(v)) - 3600000L
    val unmatched = p.join(
      v.select($"user_id".as("vu"), $"ts".as("vts")),
      $"vu" === $"user_id" &&
        $"vts" >= $"ts" - expr("INTERVAL 12 hours") && $"vts" < $"ts",
      "left_anti")
    val evictedWant = unmatched
      .filter(expr("unix_micros(ts) div 1000") < wmMs)
      .select($"event_id").as[Long].collect().sorted.toSeq
    val withheld = unmatched
      .filter(expr("unix_micros(ts) div 1000") >= wmMs).count()

    assert(inner == innerWant && inner.nonEmpty)
    assert(evictedGot == evictedWant && evictedGot.nonEmpty,
      s"evicted set mismatch (${evictedGot.size} vs ${evictedWant.size})")
    // the boundary is exercised from both sides at this testdata tier
    assert(withheld >= 0)
  }

  test("flatMapGroupsWithState sessionizer equals the batch session windows") {
    import spark.implicits._
    // One file → one data micro-batch (in-batch sort handles disorder),
    // plus a far-future sentinel for user 1 only: it closes user 1's real
    // sessions by gap evidence IN the batch, and pushes the watermark far
    // enough that user 2's open session emits via the EVENT-TIME TIMEOUT
    // branch in the follow-up batch — both emission paths exercised.
    val d = Files.createTempDirectory("stream-fmgws").toString
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.5, "{}"),
      (2L, ts("2024-01-01 10:20:00"), 1L, "click", 2.25, "{}"), // merges (gap 20m)
      (3L, ts("2024-01-01 11:30:00"), 1L, "view", 3.0, "{}"),   // new session
      (4L, ts("2024-01-01 09:59:00"), 2L, "view", 5.5, "{}"),
      (5L, ts("2024-01-01 12:10:00"), 2L, "purchase", 6.0, "{}"),
      (9L, ts("2024-01-02 00:00:00"), 1L, "click", 0.5, "{}")   // sentinel
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    events.coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")

    val stream = StreamingWindows.readEventStream(spark, s"$d/events.parquet")
    val got = StreamingWindows.runToCompletion(spark,
        StreamingWindows.sessionize(spark, stream), "t_fmgws", OutputMode.Append())
      .orderBy($"user_id", $"s_start")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSeq
    // batch twin, minus the sentinel's still-open session
    val want = EventWindows.queries("ev_session")(spark, d)
      .filter($"s_start" < lit(ts("2024-01-02 00:00:00")))
      .orderBy($"user_id", $"s_start")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSeq
    assert(got == want && got.size == 4,
      s"stream sessions $got vs batch $want")
  }

  test("sessionizer merges an out-of-order event from a LATER micro-batch (s_start moves back)") {
    import spark.implicits._
    // ADVICE r7: an event in micro-batch 2 that PRECEDES the open
    // session's start (t < s.start but t ≥ watermark — reachable because
    // the watermark tracks the global max while this user's state lags)
    // must pull s_start back to t, or the stream diverges from the batch
    // ev_session semantics. Two files → two micro-batches
    // (maxFilesPerTrigger=1, mtime order):
    //   file A: user 1 @ 10:30, 10:40          (session opens at 10:30;
    //                                           wm after A = 10:10)
    //   file B: user 1 @ 10:15 (late, ≥ wm) + user 2 sentinel @ 12:00
    // The no-data finalization batch then times out user 1's session:
    // expected s_start 10:15 (merged), NOT 10:30.
    val d = Files.createTempDirectory("stream-ooo").toString
    Files.createDirectories(Paths.get(s"$d/events.parquet"))
    def addFile(name: String, rows: Seq[(Long, Timestamp, Long, String, Double, String)],
                mtime: Long): Unit = {
      val stage = Files.createTempDirectory("stage").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = Paths.get(s"$d/events.parquet/$name")
      Files.move(part.toPath, dest)
      dest.toFile.setLastModified(mtime)
    }
    addFile("a.parquet", Seq(
      (1L, ts("2024-01-01 10:30:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 10:40:00"), 1L, "click", 2.0, "{}")), 1000000L)
    addFile("b.parquet", Seq(
      (3L, ts("2024-01-01 10:15:00"), 1L, "view", 4.0, "{}"),
      (4L, ts("2024-01-01 12:00:00"), 2L, "view", 8.0, "{}")), 2000000L)

    val stream = StreamingWindows.readEventStream(spark, s"$d/events.parquet")
    val got = StreamingWindows.runToCompletion(spark,
        StreamingWindows.sessionize(spark, stream), "t_fmgws_ooo", OutputMode.Append())
      .orderBy($"user_id", $"s_start")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSeq
    // batch twin on the merged data, minus the sentinel's open session
    val want = EventWindows.queries("ev_session")(spark, d)
      .filter($"user_id" === 1L)
      .orderBy($"user_id", $"s_start")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSeq
    assert(want.head._2 == ts("2024-01-01 10:15:00")) // scenario sanity
    assert(got == want, s"stream sessions $got vs batch $want")
  }

  test("restart from checkpoint processes only new files, file sink stays exactly-once") {
    import spark.implicits._
    // The recovery contract a production ingest relies on: the source
    // offset log (processed files) and the sink commit log both live in
    // the checkpoint, so a stop/restart neither reprocesses old input
    // nor duplicates old output.
    val root = Files.createTempDirectory("stream-ckpt")
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    Files.createDirectories(Paths.get(in))

    def addFile(name: String, ids: Seq[Long]): Unit = {
      val stage = Files.createTempDirectory("stage").toString
      ids.toDF("id").coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$in/$name"))
    }
    def runOnce(): Unit = {
      val q = spark.readStream.schema("id BIGINT").parquet(in)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def sinkIds(): Seq[Long] =
      spark.read.parquet(out).select($"id").as[Long].collect().sorted.toSeq

    addFile("f1.parquet", Seq(1L, 2L))
    runOnce()
    assert(sinkIds() == Seq(1L, 2L))

    addFile("f2.parquet", Seq(3L))
    runOnce() // restart: f1 must not reprocess, 1/2 must not duplicate
    assert(sinkIds() == Seq(1L, 2L, 3L))
  }

  test("STATEFUL restart from checkpoint: window state recovers, final sink equals the uninterrupted run") {
    import spark.implicits._
    // The recovery property a 100 TB ingest actually relies on, beyond
    // the stateless offset-log test above: the AGGREGATION STATE STORE
    // (open windows + watermark) is restored from the checkpoint, so a
    // window whose events straddle the kill/restart boundary still
    // aggregates ALL of them, and the final file-sink contents are
    // byte-identical to a run that was never interrupted (exactly-once:
    // nothing lost, nothing duplicated, nothing double-counted).
    val root = Files.createTempDirectory("stream-state-ckpt")
    def mkdir(p: String): String = { Files.createDirectories(Paths.get(p)); p }
    def addFile(dir: String, name: String,
                rows: Seq[(Timestamp, String, Double)]): Unit = {
      val stage = Files.createTempDirectory("stage").toString
      rows.toDF("ts", "event_type", "value")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$dir/$name"))
    }
    def drain(src: String, out: String, ckpt: String): Unit = {
      val q = StreamingWindows.tumbling(
          spark.readStream.schema("ts TIMESTAMP, event_type STRING, value DOUBLE")
            .parquet(src))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def sink(out: String): Seq[(Timestamp, Timestamp, String, Long, Double)] =
      spark.read.schema(
          "w_start TIMESTAMP, w_end TIMESTAMP, event_type STRING, n BIGINT, sum_value DOUBLE")
        .parquet(out)
        .as[(Timestamp, Timestamp, String, Long, Double)]
        .collect().sortBy(r => (r._1.getTime, r._3)).toSeq

    // batch1 leaves window [12:00,13:00) OPEN in state (watermark 11:59);
    // batch2's 12:30 click must merge into that recovered state.
    val batch1 = Seq(
      (ts("2024-01-01 10:10:00"), "click", 1.0),
      (ts("2024-01-01 10:50:00"), "click", 2.0),
      (ts("2024-01-01 11:20:00"), "view",  3.0),
      (ts("2024-01-01 12:10:00"), "click", 4.0),
      (ts("2024-01-01 12:59:00"), "view",  5.0))
    val batch2 = Seq(
      (ts("2024-01-01 12:30:00"), "click", 6.0),
      (ts("2024-01-01 13:40:00"), "view",  7.0),
      (ts("2024-01-01 16:00:00"), "click", 8.0))

    // interrupted: half the files, stop, add the rest, restart from ckpt
    val in = mkdir(s"$root/in")
    addFile(in, "f1.parquet", batch1)
    drain(in, s"$root/out", s"$root/ckpt")
    val afterKill = sink(s"$root/out")
    // only [10,11) click is finalized at watermark 11:59 — the spanning
    // window must still be open state, not emitted output
    assert(afterKill.map(_._1) == Seq(ts("2024-01-01 10:00:00")), s"run1 emitted $afterKill")
    addFile(in, "f2.parquet", batch2)
    drain(in, s"$root/out", s"$root/ckpt")

    // uninterrupted: same data, one run, fresh sink + checkpoint
    val inFull = mkdir(s"$root/in_full")
    addFile(inFull, "f1.parquet", batch1)
    addFile(inFull, "f2.parquet", batch2)
    drain(inFull, s"$root/out_full", s"$root/ckpt_full")

    val got  = sink(s"$root/out")
    val want = sink(s"$root/out_full")
    assert(got == want && got.nonEmpty, s"restart run $got != uninterrupted $want")
    // the boundary-spanning window aggregated BOTH sides of the restart
    val spanning = got.filter(r => r._1 == ts("2024-01-01 12:00:00") && r._3 == "click")
    assert(spanning == Seq((ts("2024-01-01 12:00:00"), ts("2024-01-01 13:00:00"), "click", 2L, 10.0)),
      s"spanning window $spanning")
    // exactly-once: no window emitted twice across the two runs
    assert(got.map(r => (r._1, r._3)).distinct.size == got.size)
  }

  test("foreachBatch JDBC sink stays idempotent under batch replay") {
    import spark.implicits._
    // The production streaming→warehouse pattern: foreachBatch gives
    // at-least-once batch delivery, so the write must be keyed on
    // batchId and replay-safe — delete-then-insert per batchId makes a
    // redelivered micro-batch a no-op instead of a duplicate.
    val url = s"jdbc:derby:${Files.createTempDirectory("fb-derby")}/db;create=true"
    val props = new java.util.Properties()
    Seq((0L, 0.0)).toDF("event_id", "value").limit(0)
      .withColumn("batch_id", lit(0L))
      .write.mode("overwrite").jdbc(url, "fb_sink", props)

    def upsertBatch(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      // idempotence guard: wipe any prior attempt of THIS batch first
      val con = java.sql.DriverManager.getConnection(url)
      // Spark's JDBC writer passes the table name through unquoted but
      // quotes COLUMN names — Derby stores them case-sensitive, so the
      // delete must quote the column the same way
      try con.createStatement().executeUpdate(
        s"""DELETE FROM fb_sink WHERE "batch_id" = $batchId""")
      finally con.close()
      df.withColumn("batch_id", lit(batchId))
        .write.mode("append").jdbc(url, "fb_sink", props)
    }

    val d = Files.createTempDirectory("stream-fb").toString
    Seq((1L, 1.5), (2L, 2.25), (3L, 9.0)).toDF("event_id", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/ev.parquet")
    val q = spark.readStream
      .schema("event_id BIGINT, value DOUBLE")
      .parquet(s"$d/ev.parquet")
      .writeStream
      .foreachBatch(upsertBatch _)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    def sinkRows() = spark.read.jdbc(url, "fb_sink", props)
      .select($"event_id").as[Long].collect().sorted.toSeq
    assert(sinkRows() == Seq(1L, 2L, 3L))

    // simulate the at-least-once redelivery of batch 0: same data, same
    // batchId — the sink must be unchanged, not doubled
    upsertBatch(spark.read.parquet(s"$d/ev.parquet"), 0L)
    assert(sinkRows() == Seq(1L, 2L, 3L))
  }

  test("stream-static enrichment join equals the batch join, unknown keys kept") {
    import spark.implicits._
    // user 2 has no dim row → must pass through with null segment
    val dim = Seq((1L, "gold")).toDF("user_id", "segment")
    val stream = StreamingWindows.readEventStream(spark, s"$dir/events.parquet")
    val got = StreamingWindows.runToCompletion(spark,
        StreamingWindows.enrich(stream, dim), "t_enrich", OutputMode.Append())
      .select($"event_id", $"segment")
      .as[(Long, Option[String])].collect().sortBy(_._1).toSeq
    val want = spark.read.parquet(s"$dir/events.parquet")
      .join(dim, Seq("user_id"), "left_outer")
      .select($"event_id", $"segment")
      .as[(Long, Option[String])].collect().sortBy(_._1).toSeq
    assert(got == want && got.nonEmpty)
    assert(got.exists(_._2.isEmpty) && got.exists(_._2 == Some("gold")))
  }

  test("latest-state CDC view equals the batch max_by over any micro-batch split") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, max_by, struct}
    val sf = "/root/testdata/sf0.001"
    val staged = Files.createTempDirectory("stream-latest").toString
    graft.Tables.load(spark, sf, "events")
      .repartition(4).write.mode("overwrite").parquet(s"$staged/events.parquet")
    val stream = StreamingWindows.latestState(spark,
      StreamingWindows.readEventStream(spark, s"$staged/events.parquet"))
    // update-mode sink logs every per-key revision across the 4
    // micro-batches; revisions are monotone in (ts, event_id), so the
    // per-key max IS the final state — compare that to the batch twin.
    val sink = StreamingWindows.runToCompletion(spark, stream, "t_latest",
      OutputMode.Update())
    val got = sink.groupBy($"user_id")
      .agg(max_by(struct($"ts", $"event_type", $"value", $"event_id"),
        struct($"ts", $"event_id")).as("r"))
      .select($"user_id", $"r.ts", $"r.event_type", $"r.value", $"r.event_id")
      .as[(Long, java.sql.Timestamp, String, Double, Long)].collect().toSet
    val batch = graft.Tables.load(spark, sf, "events")
      .groupBy(col("user_id"))
      .agg(max_by(struct($"ts", $"event_type", $"value", $"event_id"),
        struct($"ts", $"event_id")).as("r"))
      .select($"user_id", $"r.ts", $"r.event_type", $"r.value", $"r.event_id")
      .as[(Long, java.sql.Timestamp, String, Double, Long)].collect().toSet
    assert(got == batch && got.nonEmpty)
  }

  test("mapGroupsWithState keeps per-user running counts") {
    import spark.implicits._
    val stream = StreamingWindows.readEventStream(spark, s"$dir/events.parquet")
    val got = StreamingWindows.runToCompletion(spark,
        StreamingWindows.runningCounts(spark, stream), "t_counts", OutputMode.Update())
      // multiple micro-batches (maxFilesPerTrigger=1) emit running rows;
      // the latest per user is the final state
      .groupBy($"user_id").agg(max($"n").as("n"))
      .orderBy($"user_id")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 4L), (2L, 2L)))
  }

  test("st_running_counts: final state per user; last_ts survives at µs precision") {
    import spark.implicits._
    val a = java.sql.Timestamp.valueOf("2024-01-01 10:00:00.123456")
    val b = java.sql.Timestamp.valueOf("2024-01-01 10:00:00.123457") // +1 µs
    val events = Seq(
      (1L, a, 5L, "view", 1.0, "{}"),
      (2L, b, 5L, "click", 2.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 6L, "view", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val d = java.nio.file.Files.createTempDirectory("struncnt-spec").toString
    events.write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = StreamingWindows.queries("st_running_counts")(spark, d)
      .select($"user_id", $"n", $"last_ts")
      .as[(Long, Long, java.sql.Timestamp)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // a getTime-millis fold would emit ...123 (ms floor) for user 5 —
    // the +1 µs event must survive the state round-trip exactly
    assert(out(5L) == ((2L, b)))
    assert(out(6L)._1 == 1L)
  }

  test("st_dedup: a doubled delivery collapses to exactly one row per event_id") {
    import spark.implicits._
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), 1L, "click", 2.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 2L, "view", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val d = java.nio.file.Files.createTempDirectory("stdedup-spec").toString
    events.write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = StreamingWindows.queries("st_dedup")(spark, d)
      .select($"event_id", $"user_id", $"event_type", $"value")
      .as[(Long, Long, String, Double)].collect().toSeq.sortBy(_._1)
    // the query delivers every event twice; each must survive exactly once
    assert(out == Seq((1L, 1L, "view", 1.0), (2L, 1L, "click", 2.0),
      (3L, 2L, "view", 3.0)))
  }

  test("declared st_index_update drains exactly the batch encode, bit-for-bit") {
    import spark.implicits._
    // The stream-static encode is stateless, so the single-data-batch
    // drain must equal the batch twin's output EXACTLY — including the
    // l2sq doubles (same ascending-index fold) and the lowest-code
    // tie-break (strict < over the ascending-code list ≡ the batch
    // window's (l2sq, code) order).
    val sf = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("st_index_update")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    val want = graft.SparkEntry.queries("sim_index_update")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == want && got.nonEmpty)
    // every arrival vector encodes in all 8 subspaces
    assert(got.groupBy(_._1).values.forall(_.size == 8))
  }
}
