package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.streaming.EventStreams.{Event, Session}

/** Multi-micro-batch behavior of [[EventStreams.sessionizeStream]] —
  * the AvailableNow harness queries (q38) drain the input in ONE batch,
  * so the cross-batch late-event branches only execute here:
  *
  *   - a watermark-legal late event BEFORE the open session's start but
  *     within the gap must widen the session start (not corrupt it);
  *   - a watermark-legal late event more than a gap before the open
  *     session belongs to an earlier, closed-by-time session and is
  *     emitted as its own singleton session;
  *   - a session whose gap deadline the watermark already passed times
  *     out rather than throwing on a below-watermark timeout timestamp.
  */
class SessionizeStreamSpec extends SparkTestBase {

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  private def run(gapMinutes: Int)(batches: Seq[Event]*): Seq[Session] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val sink = s"sessions_${System.nanoTime()}"
    val q = EventStreams.sessionizeStream(source.toDS(), gapMinutes)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(sink).start()
    try {
      batches.foreach { b => source.addData(b); q.processAllAvailable() }
      spark.table(sink).as[Session].collect().toSeq
    } finally q.stop()
  }

  test("watermark-legal late event before session start widens the session") {
    // b1 opens 10:00-10:05 (watermark after b1 = 09:35); b2's 09:50 is
    // legal and within the gap BEFORE the start -> start must move to
    // 09:50; b3's 13:00 is past the gap -> closes the widened session
    val out = run(gapMinutes = 30)(
      Seq(Event(1, ts("10:00"), 1L, "c", 1.0), Event(2, ts("10:05"), 1L, "c", 1.0)),
      Seq(Event(3, ts("09:50"), 1L, "c", 1.0)),
      Seq(Event(4, ts("13:00"), 1L, "c", 1.0)))
    val closed = out.filter(_.n_events == 3)
    assert(closed.map(s => (s.session_start, s.session_end)) ==
      Seq((ts("09:50"), ts("10:05"))), s"got $out")
  }

  test("late event more than a gap before the open session emits a singleton") {
    // gap 10 < watermark delay 30: b1 opens at 12:00 (watermark 11:30);
    // b2's 11:40 is watermark-legal but > gap before the session start —
    // it must NOT merge into (or corrupt) the open session
    val out = run(gapMinutes = 10)(
      Seq(Event(1, ts("12:00"), 1L, "c", 1.0)),
      Seq(Event(2, ts("11:40"), 1L, "c", 1.0)))
    assert(out.contains(Session(1L, ts("11:40"), ts("11:40"), 1, 1.0)), s"got $out")
  }

  test("session times out via watermark without below-watermark timeout errors") {
    // u1's session last=10:00, gap deadline 10:30; u2 pushes the
    // watermark to 11:30 > deadline. The timeout must clamp above the
    // watermark (not throw) and the session must be emitted by timeout.
    val out = run(gapMinutes = 30)(
      Seq(Event(1, ts("10:00"), 1L, "c", 2.0)),
      Seq(Event(2, ts("12:00"), 2L, "c", 1.0)),
      Seq(Event(3, ts("13:30"), 2L, "c", 1.0)))
    assert(out.exists(s => s.user_id == 1L && s.session_start == ts("10:00") &&
      s.n_events == 1), s"got $out")
  }
}
