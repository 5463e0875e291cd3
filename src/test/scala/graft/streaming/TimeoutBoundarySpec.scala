package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Pins the EXACT event-time-timeout firing boundary of
  * flatMapGroupsWithState under microsecond event times — the contract
  * the st_sessionize oracle's emission predicate replays.
  *
  * Spark's GroupState timeout unit is MILLIseconds: the watermark is
  * floor(max event time µs / 1000) − delay_ms, and a timeout fires when
  * the watermark is STRICTLY past the registered timestamp. With the
  * sessionizer registering floor((last+gap)/1000), a user's final
  * session emits iff
  *   floor_ms(last + gap) < floor_ms(max_ts) − gap_ms.
  * The four δ probes below straddle that boundary at µs resolution: the
  * session whose timeout lands exactly ON the watermark (δ = 0) or
  * within the same floored millisecond (δ = 999 µs) must NOT emit; one
  * full millisecond past (δ = 1000 µs) must.
  */
class TimeoutBoundarySpec extends SparkSpec {

  private val GapUs = 30L * 60 * 1000000 // 30 min in µs

  /** Returns whether user 1's lone session was emitted when the
    * watermark driver (user 2) sits at L + 2·gap + δµs. */
  private def fires(deltaUs: Long): Boolean = {
    import spark.implicits._
    val baseUs = 1704067200L * 1000000L // 2024-01-01 00:00:00 UTC, ms-aligned
    def tsOf(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000000L * 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    val d = Files.createTempDirectory("timeout-probe").toString
    Seq(
      (1L, tsOf(baseUs), 1L, "click", 1.0, "{}"),
      (2L, tsOf(baseUs + 2 * GapUs + deltaUs), 2L, "view", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = StreamingWindows.runToCompletion(spark,
      StreamingWindows.sessionize(spark,
        StreamingWindows.readEventStream(spark, s"$d/events.parquet")),
      s"t_timeout_probe_$deltaUs".replace("-", "m"), OutputMode.Append())
      .select($"user_id").as[Long].collect()
    got.contains(1L)
  }

  test("timeout fires one full floored millisecond past the watermark, not before") {
    assert(!fires(-1000L), "δ=-1ms: watermark short of timeout must not fire")
    assert(!fires(0L), "δ=0: timeout exactly ON the watermark must not fire (strict <)")
    assert(!fires(999L), "δ=+999µs: same floored ms as the watermark must not fire")
    assert(fires(1000L), "δ=+1ms: watermark strictly past timeout must fire")
  }
}
