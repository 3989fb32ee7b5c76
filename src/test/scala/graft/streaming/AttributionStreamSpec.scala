package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.streaming.EventStreams.Event

/** Multi-micro-batch behavior of the stream-STREAM interval join
  * ([[EventStreams.attribution]], q49) — the AvailableNow harness drains
  * in one batch, so cross-batch buffering only executes here:
  *
  *   - a purchase arriving in a later batch joins clicks buffered from an
  *     earlier one (and vice versa);
  *   - clicks outside the interval window never match;
  *   - a click below the watermark when it arrives is dropped, not joined.
  */
class AttributionStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  private def run(batches: Seq[Event]*): Seq[(Long, Long, String, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val sink = s"attr_${System.nanoTime()}"
    val (purchases, clicks) =
      EventStreams.attributionSides(source.toDF(), delay = "30 minutes")
    val q = EventStreams.attribution(purchases, clicks, windowMinutes = 60)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(sink).start()
    try {
      batches.foreach { b => source.addData(b); q.processAllAvailable() }
      spark.table(sink).collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
          r.getAs[String]("click_ts"), r.getAs[Long]("click_id")))
        .toSeq.sorted
    } finally q.stop()
  }

  test("purchase in a later batch joins clicks buffered from an earlier batch") {
    val out = run(
      Seq(Event(1, ts("10:00"), 1L, "click", 1.0),
        Event(2, ts("10:20"), 1L, "click", 1.0),
        Event(3, ts("09:00"), 1L, "click", 1.0)), // > 60 min before the purchase
      Seq(Event(10, ts("10:30"), 1L, "purchase", 5.0)))
    assert(out == Seq(
      (10L, 1L, "2024-01-01 10:00:00", 1L),
      (10L, 1L, "2024-01-01 10:20:00", 2L)), s"got $out")
  }

  test("clicks of other users or after the purchase never match") {
    val out = run(
      Seq(Event(1, ts("10:00"), 2L, "click", 1.0),   // other user
        Event(2, ts("10:40"), 1L, "click", 1.0),     // after the purchase
        Event(3, ts("10:10"), 1L, "click", 1.0)),    // the one qualifying
      Seq(Event(10, ts("10:30"), 1L, "purchase", 5.0)))
    assert(out == Seq((10L, 1L, "2024-01-01 10:10:00", 3L)), s"got $out")
  }

  test("a purchase arriving after the click's state was evicted finds no match") {
    // b1 buffers u1's 10:00 click, evictable once the GLOBAL watermark
    // passes click_ts + window = 11:00. The global watermark is the MIN
    // over both sides' watermark operators, so b2 advances BOTH sides to
    // 14:00 (each side's event-time column must move — a click alone
    // leaves the purchase side, and hence the global, at zero); state
    // cleanup runs at the end of b2. b3's matching purchase then finds no
    // click state: no pair emits. (Rows that arrive TOGETHER join
    // regardless of the watermark: it bounds state, not same-batch input.)
    val out = run(
      Seq(Event(1, ts("10:00"), 1L, "click", 1.0),
        Event(2, ts("14:00"), 2L, "click", 1.0)),
      Seq(Event(3, ts("14:00"), 3L, "click", 1.0),
        Event(4, ts("14:00"), 4L, "purchase", 1.0)),
      Seq(Event(10, ts("10:30"), 1L, "purchase", 5.0)))
    assert(out == Seq(), s"got $out")
  }
}
