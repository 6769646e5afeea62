package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

class EventSessionizerSpec extends AnyFunSuite with SparkSpec {

  test("advance: gap closes a session, dense events extend it") {
    def ev(id: Long, minutes: Long) = SessionEvent(7L, id, new java.sql.Timestamp(minutes * 60L * 1000))
    // 0min, 10min (session 1) | 120min (session 2 opens, closes s1)
    val (st, closed) = EventSessionizer.advance(7L, None, Seq(ev(1, 0), ev(2, 10), ev(3, 120)))
    assert(closed == List(ClosedSession(7L, 1L, 2L, 0L, 10L * 60 * 1000000)))
    assert(st.contains(SessionState(2L, 120L * 60 * 1000000, 120L * 60 * 1000000, 1L)))
    // resuming from state: event inside gap extends, none closed
    val (st2, closed2) = EventSessionizer.advance(7L, st, Seq(ev(4, 140)))
    assert(closed2.isEmpty && st2.get.nEvents == 2L)
    // resuming from an IDLE marker (post-timeout): session numbering
    // continues — no (user, session_id) reuse vs the batch twin
    val idle = Some(SessionState(3L, 0L, 0L, 0L))
    val (st3, closed3) = EventSessionizer.advance(7L, idle, Seq(ev(9, 300)))
    assert(closed3.isEmpty)
    assert(st3.contains(SessionState(3L, 300L * 60 * 1000000, 300L * 60 * 1000000, 1L)))
  }

  test("streaming sessionization emits gap-closed sessions (file source)") {
    val dir = Files.createTempDirectory("sess-stream").toFile
    val ckpt = Files.createTempDirectory("sess-ckpt").toFile
    def line(id: Long, user: Long, hhmm: String) =
      s"""{"event_id":$id,"ts":"2024-01-01T$hhmm:00.000Z","user_id":$user,"event_type":"click","value":1.0,"props":"{}"}"""
    // user 1: 00:00, 00:10 (session 1), 02:00 (opens session 2, closes s1
    //   via the observed gap; session 2 stays open past the watermark)
    // user 2: 00:05 only — closed by EVENT-TIME TIMEOUT once the
    //   watermark (02:00 - 30min) passes 00:05 + gap
    Files.write(new java.io.File(dir, "a.json").toPath, Seq(
      line(1, 1, "00:00"), line(2, 1, "00:10"), line(3, 2, "00:05"), line(4, 1, "02:00"))
      .mkString("\n").getBytes)

    val q = EventSessionizer.sessions(EventStream.readEventStream(spark, dir.getAbsolutePath))
      .writeStream.outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .format("memory").queryName("sessions_test").start()
    q.awaitTermination()

    val rows = spark.table("sessions_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // gap-closed session for user 1 AND timeout-closed session for user 2
    assert(rows == Set((1L, 1L, 2L), (2L, 1L, 1L)))
  }
}
