package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.streaming.EventStreams.{Event, Session}

/** Multi-micro-batch behavior of [[EventStreams.sessionizeStream]] —
  * the AvailableNow harness queries (q38) drain the input in ONE batch,
  * so the cross-batch paths only execute here:
  *
  *   - a watermark-legal late event before the open session's start
  *     widens the session (not corrupts it);
  *   - consecutive late events sessionize together (one session, not
  *     per-event singletons);
  *   - a late event can BRIDGE two previously-separate sessions into one;
  *   - emission follows the session_window append rule: a session is
  *     output only once the watermark strictly passes end + gap, via a
  *     timeout clamped above the watermark (no below-watermark errors).
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
    // 09:50; b3's 13:00 advances the watermark past the gap deadline
    val out = run(gapMinutes = 30)(
      Seq(Event(1, ts("10:00"), 1L, "c", 1.0), Event(2, ts("10:05"), 1L, "c", 1.0)),
      Seq(Event(3, ts("09:50"), 1L, "c", 1.0)),
      Seq(Event(4, ts("13:00"), 1L, "c", 1.0)))
    val widened = out.filter(_.n_events == 3)
    assert(widened.map(s => (s.session_start, s.session_end)) ==
      Seq((ts("09:50"), ts("10:05"))), s"got $out")
  }

  test("consecutive late events sessionize together, not as singletons") {
    // gap 10 < watermark delay 30: b1 opens at 12:00 (watermark 11:30);
    // b2's 11:31 and 11:36 are watermark-legal and > gap before 12:00 —
    // they must form ONE 2-event session (the batch twin's answer), which
    // emits once b3 pushes the watermark past its 11:46 deadline. (The
    // separate 12:00 session also emits: its 12:10 deadline exactly
    // EQUALS the final watermark, the non-strict eviction tie.)
    val out = run(gapMinutes = 10)(
      Seq(Event(1, ts("12:00"), 1L, "c", 1.0)),
      Seq(Event(2, ts("11:31"), 1L, "c", 1.0), Event(3, ts("11:36"), 1L, "c", 2.0)),
      Seq(Event(4, ts("12:40"), 2L, "c", 1.0)))
    assert(out.contains(Session(1L, ts("11:31"), ts("11:36"), 2, 3.0)), s"got $out")
    // the late pair must never surface as singletons
    assert(!out.exists(s => s.user_id == 1L && s.n_events == 1 &&
      s.session_start != ts("12:00")), s"got $out")
  }

  test("late event bridges two separate open sessions into one") {
    // b1: 10:00 and 10:50 are two sessions (50 min > gap 30, watermark
    // after b1 = 10:20); b2's 10:25 is legal and within the gap of BOTH —
    // it must bridge them; b3 advances the watermark past the merged
    // deadline (11:20) -> ONE 3-event session emits
    val out = run(gapMinutes = 30)(
      Seq(Event(1, ts("10:00"), 1L, "c", 1.0), Event(2, ts("10:50"), 1L, "c", 1.0)),
      Seq(Event(3, ts("10:25"), 1L, "c", 1.0)),
      Seq(Event(4, ts("13:00"), 2L, "c", 1.0)))
    val u1 = out.filter(_.user_id == 1L)
    assert(u1 == Seq(Session(1L, ts("10:00"), ts("10:50"), 3, 3.0)), s"got $out")
  }

  test("custom-state and native session_window forms agree at exact tie boundaries") {
    // q38 and q44 share one oracle, so their tie rules must agree with
    // the NATIVE operator's (the semantics reference):
    //   - events exactly gapMinutes apart MERGE (gap rule is <=);
    //   - a session whose end+gap EQUALS the final watermark IS emitted
    //     (native eviction is non-strict: end+gap <= watermark — the
    //     custom-state form originally used strict < and diverged here).
    // max ts 14:00, watermark delay 30m -> final watermark 13:30; gap 30m.
    //   u1: 11:00 + 11:30 (exactly gap apart) -> ONE session, emitted
    //   u2: 13:00 -> deadline 13:30 == watermark -> emitted (tie)
    //   u3: 12:59 -> deadline 13:29 <  watermark -> emitted
    //   u9: 14:00 (watermark driver) -> withheld
    import spark.implicits._
    val events = Seq(
      (1L, ts("11:00"), 1L, "c", 1.0, "{}"),
      (2L, ts("11:30"), 1L, "c", 2.0, "{}"),
      (3L, ts("13:00"), 2L, "c", 1.0, "{}"),
      (4L, ts("12:59"), 3L, "c", 1.0, "{}"),
      (5L, ts("14:00"), 9L, "c", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val stage = java.nio.file.Files.createTempDirectory("graft_ties").toString
    events.write.mode("overwrite").parquet(s"$stage/events")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("s"),
        date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("e"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sorted
    val custom = rows(EventStreams.sessionizeStreaming(
      spark, s"$stage/events", s"$stage/out38", gapMinutes = 30))
    val native = rows(EventStreams.sessionizeWindowStreaming(
      spark, s"$stage/events", s"$stage/out44", gapMinutes = 30))
    val expect = Seq(
      (1L, "2024-01-01 11:00:00", "2024-01-01 11:30:00", 2L),
      (2L, "2024-01-01 13:00:00", "2024-01-01 13:00:00", 1L),
      (3L, "2024-01-01 12:59:00", "2024-01-01 12:59:00", 1L))
    assert(custom == expect, s"custom-state form: $custom")
    assert(native == expect, s"native session_window form: $native")
  }

  test("timeout path emits when the watermark lands EXACTLY on the gap deadline") {
    // u1's session deadline is 10:30; b2 advances the watermark to
    // exactly 10:30 (11:00 - 30m). The b1 timeout was set at deadline-1ms,
    // so it fires at wm == deadline and the non-strict (<=) eviction rule
    // emits — pinning the tie behavior through the TIMEOUT branch (the
    // AvailableNow tie test above exercises the data-path branch).
    val out = run(gapMinutes = 30)(
      Seq(Event(1, ts("10:00"), 1L, "c", 2.0)),
      Seq(Event(2, ts("11:00"), 2L, "c", 1.0)))
    assert(out.contains(Session(1L, ts("10:00"), ts("10:00"), 1, 2.0)), s"got $out")
  }

  test("session times out via watermark without below-watermark timeout errors") {
    // u1's session deadline is 10:30; u2 pushes the watermark to 11:30 >
    // deadline. The timeout must clamp above the watermark (not throw)
    // and the session must be emitted by timeout.
    val out = run(gapMinutes = 30)(
      Seq(Event(1, ts("10:00"), 1L, "c", 2.0)),
      Seq(Event(2, ts("12:00"), 2L, "c", 1.0)),
      Seq(Event(3, ts("13:30"), 2L, "c", 1.0)))
    assert(out.exists(s => s.user_id == 1L && s.session_start == ts("10:00") &&
      s.n_events == 1), s"got $out")
  }
}
