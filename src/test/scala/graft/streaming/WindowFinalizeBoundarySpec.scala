package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Pins the EXACT append-mode finalization boundary of a watermarked
  * tumbling window — the contract the st_tumbling oracle's emission
  * predicate replays.
  *
  * Watermark = floor_ms(max event time) − delay_ms. The probes below
  * place a second event so the watermark lands δ around the first
  * window's end and record whether that window is emitted on the
  * AvailableNow no-data final batch. */
class WindowFinalizeBoundarySpec extends SparkSpec {

  private val HourUs = 3600L * 1000000L

  /** Window A = [00:00, 01:00). Driver event at 02:00 + δµs puts the
    * watermark at 01:00 + floor_ms(δ). Returns whether A emitted. */
  private def emits(deltaUs: Long): Boolean = {
    import spark.implicits._
    val baseUs = 1704067200L * 1000000L // 2024-01-01 00:00:00 UTC, ms-aligned
    def tsOf(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000000L * 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    val d = Files.createTempDirectory("winfin-probe").toString
    Seq(
      (1L, tsOf(baseUs + 600L * 1000000L), 1L, "click", 1.0, "{}"),
      (2L, tsOf(baseUs + 2 * HourUs + deltaUs), 2L, "view", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = StreamingWindows.runToCompletion(spark,
      StreamingWindows.tumbling(
        StreamingWindows.readEventStream(spark, s"$d/events.parquet")),
      s"t_winfin_probe_$deltaUs".replace("-", "m"), OutputMode.Append())
      .select($"event_type").as[String].collect()
    got.contains("click")
  }

  test("append emits a window once the watermark reaches its end (non-strict)") {
    assert(!emits(-1000L), "δ=-1ms: watermark short of w_end must not emit")
    assert(emits(0L), "δ=0: watermark exactly ON w_end must emit (<=)")
    assert(emits(1000L), "δ=+1ms: watermark past w_end must emit")
  }
}
