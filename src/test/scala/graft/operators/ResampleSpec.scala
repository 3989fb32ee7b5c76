package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** OHLC resample + gap fill (q144): bucket selection rules, spine
  * completeness, LOCF semantics, and the single-shuffle claim for the
  * bucketing stage.
  */
class ResampleSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // group g: events in minutes :00 and :03 (gap at :01, :02);
  // minute :00 holds three events incl. a same-ts tie broken by id
  private lazy val events = Seq(
    (1L, ts("2024-01-01 10:00:05"), "g", 5.0),
    (2L, ts("2024-01-01 10:00:05"), "g", 9.0), // same ts as id=1: id breaks tie
    (3L, ts("2024-01-01 10:00:40"), "g", 1.0),
    (4L, ts("2024-01-01 10:03:10"), "g", 7.0),
    (5L, ts("2024-01-01 10:01:00"), "h", 2.0)
  ).toDF("event_id", "ts", "event_type", "value")

  private lazy val out = Resample.ohlcGapFill(
      events, "event_type", "ts", "event_id", "value", bucketSeconds = 60L)
    .orderBy("event_type", "bucket_ts")
    .collect()

  test("spine densifies every bucket of each group's span") {
    assert(out.map(r => (r.getString(0), r.getTimestamp(1).toString)).toSeq == Seq(
      ("g", "2024-01-01 10:00:00.0"), ("g", "2024-01-01 10:01:00.0"),
      ("g", "2024-01-01 10:02:00.0"), ("g", "2024-01-01 10:03:00.0"),
      ("h", "2024-01-01 10:01:00.0")))
  }

  test("open/close select by (ts, id) order; high/low select extremes") {
    val m0 = out(0) // g @10:00 — ids 1,2 tie on ts: open = id 1's value
    assert((m0.getDouble(2), m0.getDouble(3), m0.getDouble(4), m0.getDouble(5)) ==
      ((5.0, 9.0, 1.0, 1.0)))
    assert(m0.getLong(6) == 3L && !m0.getBoolean(7))
  }

  test("gap rows carry the close forward, zero counts, null OHL") {
    val gap = out(1) // g @10:01 — empty bucket
    assert(gap.isNullAt(2) && gap.isNullAt(3) && gap.isNullAt(4))
    assert(gap.getDouble(5) == 1.0) // LOCF from 10:00's close
    assert(gap.getLong(6) == 0L && gap.getBoolean(7))
    val m3 = out(3) // g @10:03 — real row again
    assert(m3.getDouble(5) == 7.0 && !m3.getBoolean(7))
  }

  test("single-member group emits exactly its one bucket") {
    val h = out.filter(_.getString(0) == "h")
    assert(h.length == 1 && h(0).getDouble(2) == 2.0 && h(0).getDouble(5) == 2.0)
  }

  test("bucketing stage plans ONE exchange for windows + aggregate") {
    val ohlcOnly = Resample.ohlcGapFill(
      events, "event_type", "ts", "event_id", "value", 60L)
    val plan = ohlcOnly.queryExecution.executedPlan.toString
    // the (group, bucket) exchange feeds both row_number sorts AND the
    // OHLC hash aggregate; the only other exchanges are the spine's
    // min/max agg and the final group-partitioned fill window
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 3, s"expected <=3 hash exchanges, got $exchanges:\n$plan")
  }

  private def linFill(rows: Seq[(Long, String, String, Long)]): Seq[(String, Long, Boolean)] =
    Resample.linearGapFill(
        rows.map { case (id, g, t, v) => (id, g, ts(t), v) }
          .toDF("event_id", "g", "ts", "v"),
        "g", "ts", "event_id", "v", 60L)
      .orderBy("g", "bucket_ts")
      .collect().map(r => (r.getAs[java.sql.Timestamp]("bucket_ts").toString,
        r.getAs[Long]("value_i"), r.getAs[Boolean]("is_gap"))).toSeq

  test("linear fill: straight line across a gap, exact division") {
    val rows = Seq(
      (1L, "g", "2024-01-01 00:00:30", 100L),
      (2L, "g", "2024-01-01 00:03:10", 400L))
    // closes at minute 0 (100) and minute 3 (400): gaps at 1, 2 -> 200, 300
    assert(linFill(rows).map(r => (r._2, r._3)) ===
      Seq((100L, false), (200L, true), (300L, true), (400L, false)))
  }

  test("linear fill: downward series floors (not truncates) the blend") {
    val rows = Seq(
      (1L, "g", "2024-01-01 00:00:00", 0L),
      (2L, "g", "2024-01-01 00:02:00", -5L))
    // line 0 -> -5 over 2 steps: midpoint -2.5 floors to -3
    assert(linFill(rows).map(_._2) === Seq(0L, -3L, -5L))
  }

  test("linear fill: last event in a bucket is the close that anchors the line") {
    val rows = Seq(
      (1L, "g", "2024-01-01 00:00:10", 999L),
      (2L, "g", "2024-01-01 00:00:50", 10L), // close of minute 0
      (3L, "g", "2024-01-01 00:02:00", 40L))
    assert(linFill(rows).map(_._2) === Seq(10L, 25L, 40L))
  }
}
