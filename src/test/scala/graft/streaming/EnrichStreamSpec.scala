package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.streaming.EventStreams.Event

/** Multi-micro-batch behavior of [[EventStreams.enrichedHourly]] as a
  * stream (q47): the AvailableNow harness drains the input in one batch,
  * so watermark progression across batches only executes here:
  *
  *   - a window emits only once the watermark passes its end (append
  *     rule), enriched with the static dimension's segment;
  *   - facts with no dimension match drop out (inner enrichment);
  *   - events at-or-below the previous batch's watermark are late and
  *     ignored — emitted windows never change retroactively.
  */
class EnrichStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  private lazy val dim = Seq(
    (1L, "RETAIL"), (2L, "GAMING"), (3L, "RETAIL")
  ).toDF("cust_id", "seg")

  private def run(batches: Seq[Event]*): Seq[(String, String, Long, Double)] = {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val sink = s"enriched_${System.nanoTime()}"
    val q = EventStreams
      .enrichedHourly(source.toDS().toDF(), dim, "cust_id", "seg", delay = "10 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(sink).start()
    try {
      batches.foreach { b => source.addData(b); q.processAllAvailable() }
      spark.table(sink).collect().map {
        case Row(w: String, s: String, n: Long, v: Double) => (w, s, n, v)
      }.toSeq.sorted
    } finally q.stop()
  }

  test("window emits once the watermark passes its end, enriched with the dim segment") {
    // b1: three 10:xx events (users 1,2,3) — watermark 10:40, window open;
    // b2: a 12:00 event pushes the watermark to 11:50 > 11:00 — the
    // 10:00 window closes with per-segment rollups (RETAIL merges users 1+3)
    val out = run(
      Seq(Event(1, ts("10:05"), 1L, "c", 1.0), Event(2, ts("10:15"), 2L, "c", 2.0),
        Event(3, ts("10:50"), 3L, "c", 4.0)),
      Seq(Event(4, ts("12:00"), 2L, "c", 8.0)))
    assert(out == Seq(
      ("2024-01-01 10:00:00", "GAMING", 1L, 2.0),
      ("2024-01-01 10:00:00", "RETAIL", 2L, 5.0)), s"got $out")
  }

  test("facts without a dimension match drop out of the enriched aggregate") {
    val out = run(
      Seq(Event(1, ts("10:05"), 1L, "c", 1.0), Event(2, ts("10:10"), 99L, "c", 100.0)),
      Seq(Event(3, ts("12:00"), 2L, "c", 1.0)))
    assert(out == Seq(("2024-01-01 10:00:00", "RETAIL", 1L, 1.0)), s"got $out")
  }

  test("late events below the watermark never reopen an emitted window") {
    // b2 closes the 10:00 window (watermark 11:50); b3's 10:30 event is
    // far below the watermark — dropped, no second 10:00 row in append
    val out3 = run(
      Seq(Event(1, ts("10:05"), 1L, "c", 1.0)),
      Seq(Event(2, ts("12:00"), 2L, "c", 1.0)),
      Seq(Event(3, ts("10:30"), 1L, "c", 50.0), Event(4, ts("14:00"), 2L, "c", 1.0)))
    assert(out3.count(_._1 == "2024-01-01 10:00:00") == 1, s"got $out3")
    assert(out3.contains(("2024-01-01 10:00:00", "RETAIL", 1L, 1.0)), s"got $out3")
  }
}
