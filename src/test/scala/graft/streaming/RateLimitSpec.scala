package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkTestBase

/** Pins the q204/q205 token-bucket recurrence: integer micro-token
  * refill/clamp/deny arithmetic, input-order independence (only
  * (ts, event_id) order matters), and the streaming twin's
  * certified-prefix agreement with batch.
  */
class RateLimitSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private def ev(id: Long, t: String, u: Long): EventStreams.Event =
    EventStreams.Event(id, ts(t), u, "click", 1.0)

  // capacity 2 tokens, cost 1 token, refill 1 token / 6h, micro-units
  private val cap = 2000000L
  private val div = 21600L // us per micro-token = 6h*3.6e9us / 1e6
  private val cost = 1000000L

  test("rateLimit: refill, deny below cost, clamp at capacity") {
    val events = Seq(
      ev(1, "2024-01-01 00:00:00", 1), // full bucket: allow, level 1.0
      ev(2, "2024-01-01 00:01:00", 1), // +60s/21600us = 2777: allow, 2777
      ev(3, "2024-01-01 00:02:00", 1), // level 5554 < cost: DENY
      ev(4, "2024-01-01 06:02:00", 1), // +6h = 1 token: allow, 5554
      ev(5, "2024-01-05 00:00:00", 1)  // huge gap: clamp to cap, allow
    ).toDS()
    val out = EventStreams.rateLimit(events, cap, div, cost)
      .collect().sortBy(_.event_id)
    assert(out.map(_.allowed).toSeq == Seq(true, true, false, true, true))
    assert(out.map(_.level_after).toSeq ==
      Seq(1000000L, 2777L, 5554L, 5554L, 1000000L))
  }

  test("rateLimit: decisions depend on (ts, id) order, not input order") {
    val fwd = Seq(ev(1, "2024-01-01 00:00:00", 7), ev(2, "2024-01-01 00:30:00", 7),
      ev(3, "2024-01-01 01:00:00", 7), ev(4, "2024-01-01 09:00:00", 7))
    val a = EventStreams.rateLimit(fwd.toDS(), cap, div, cost)
      .collect().sortBy(_.event_id).toSeq
    val b = EventStreams.rateLimit(fwd.reverse.toDS().repartition(4), cap, div, cost)
      .collect().sortBy(_.event_id).toSeq
    assert(a == b)
    assert(a.map(_.allowed) == Seq(true, true, false, true))
  }

  test("rateLimitStreaming emits exactly the batch prefix at/below the watermark") {
    val dir = Files.createTempDirectory("graft_rl").toString
    val events = Seq(
      ev(1, "2024-01-01 00:00:00", 1), ev(2, "2024-01-01 00:01:00", 1),
      ev(3, "2024-01-01 00:02:00", 1), ev(4, "2024-01-01 06:02:00", 1),
      ev(5, "2024-01-01 02:00:00", 2), ev(6, "2024-01-01 02:10:00", 2),
      // max ts 12:00 -> final watermark 11:30; e4 certified, e7 is not
      ev(7, "2024-01-01 11:45:00", 2), ev(8, "2024-01-01 12:00:00", 3)
    )
    events.toDF().write.parquet(s"$dir/in")
    val streamed = EventStreams.rateLimitStreaming(spark, s"$dir/in", s"$dir/out",
        cap, div, cost)
      .collect().map(_.toString).sortBy(identity).toSeq
    val wmMs = ts("2024-01-01 12:00:00").getTime - 30L * 60000
    val batch = EventStreams.rateLimit(events.toDS(), cap, div, cost)
      .toDF()
    val certified = events.filter(_.ts.getTime <= wmMs).map(_.event_id).toSet
    val expected = batch.collect()
      .filter(r => certified.contains(r.getAs[Long]("event_id")))
      .map(_.toString).sortBy(identity).toSeq
    assert(streamed == expected)
    assert(streamed.size == 6) // e7, e8 stay unemitted
  }
}
