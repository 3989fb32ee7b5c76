package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s"2024-01-01 $s")

  private lazy val intervals = Seq(
    ("w1", ts("10:00:00"), ts("11:00:00")),
    ("w2", ts("10:30:00"), ts("12:00:00")), // overlaps w1
    ("w3", ts("15:00:00"), ts("15:00:00")), // zero-length, still inclusive
    ("w4", ts("16:00:00"), ts("14:00:00"))  // degenerate end < start: dropped
  ).toDF("win", "start", "end")

  private def join(points: org.apache.spark.sql.DataFrame, bucketSeconds: Long) =
    RangeJoin.pointInInterval(points, "ts", intervals, "start", "end", bucketSeconds)
      .select("pid", "win").collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted

  private lazy val points = Seq(
    (1L, ts("10:15:00")), // w1 only
    (2L, ts("10:45:00")), // w1 AND w2 (overlap, both matched, no dups)
    (3L, ts("11:00:00")), // w1 right endpoint (inclusive) + w2
    (4L, ts("13:00:00")), // nothing
    (5L, ts("15:00:00")), // zero-length w3
    (6L, ts("15:30:00"))  // inside the degenerate w4's [16:00,14:00]? must NOT match
  ).toDF("pid", "ts")

  private val expected = Seq(
    (1L, "w1"), (2L, "w1"), (2L, "w2"), (3L, "w1"), (3L, "w2"), (5L, "w3"))

  test("inclusive bounds, overlapping intervals, no duplicate pairs") {
    assert(join(points, bucketSeconds = 3600) == expected)
  }

  test("result is bucket-size invariant (small buckets span many per interval)") {
    assert(join(points, bucketSeconds = 60) == expected)
    assert(join(points, bucketSeconds = 7 * 24 * 3600) == expected)
  }

  test("randomized corpus matches brute force") {
    val rnd = new scala.util.Random(13L)
    val base = 1700000000L
    val ivs = (0 until 60).map { i =>
      val s = base + rnd.nextInt(100000)
      (s"i$i", new Timestamp(s * 1000L), new Timestamp((s + rnd.nextInt(5000)) * 1000L))
    }
    val pts = (0 until 300).map(i =>
      (i.toLong, new Timestamp((base + rnd.nextInt(105000)) * 1000L)))
    val expect = (for {
      (pid, pt) <- pts
      (w, s, e) <- ivs
      if !pt.before(s) && !pt.after(e)
    } yield (pid, w)).sorted
    val got = RangeJoin.pointInInterval(
        pts.toDF("pid", "ts"), "ts", ivs.toDF("win", "start", "end"),
        "start", "end", bucketSeconds = 1000)
      .select("pid", "win").collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(got == expect)
  }
}
