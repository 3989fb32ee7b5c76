package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

/** Pins the q206/q207 integer time-series contracts: zero-filled spine,
  * floored-mean ACF arithmetic, and the Holt fold's floor division on
  * NEGATIVE trends (the truncate-vs-floor bug class).
  */
class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(day: Int, n: Int, t: String) =
    (1 to n).map(i => (t, Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")))

  test("dailyCountSpine zero-fills missing days over the global span") {
    val df = (ev(1, 2, "a") ++ ev(3, 1, "a") ++ ev(2, 5, "b"))
      .toDF("event_type", "ts")
    val g = Acf.dailyCountSpine(df, "event_type", "ts")
      .orderBy("k", "i").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(g.toSeq == Seq(("a", 0L, 2L), ("a", 1L, 0L), ("a", 2L, 1L),
      ("b", 0L, 0L), ("b", 1L, 5L), ("b", 2L, 0L)))
  }

  test("dailyCountAcf: alternating series has acf(1) = -1, acf(2) = +1") {
    // counts 2,0,2,0,2 -> mu = 6 div 5 = 1, dv = +1,-1,+1,-1,+1:
    // den = 5, num1 = -4, num2 = +3
    val df = Seq(1, 3, 5).flatMap(d => ev(d, 2, "x")).toDF("event_type", "ts")
    val a = Acf.dailyCountAcf(df, "event_type", "ts", maxLag = 2)
      .orderBy("lag").collect()
    assert(a.map(_.getAs[Long]("n_days")).toSeq == Seq(5L, 5L))
    // (-4e6 + 2e6*5) div 5 - 2e6 = -800000 (exact floor via the offset)
    assert(a(0).getAs[Long]("acf_micro") == -800000L)
    assert(a(1).getAs[Long]("acf_micro") == 600000L)
  }

  test("forecast extrapolates an exact linear series with its true slope") {
    // y = 10, 20, 30, ... : l_t = y_t, b_t = 10 exactly at every step
    val df = (1 to 6).flatMap(d => ev(d, 10 * d, "x")).toDF("event_type", "ts")
    val f = HoltWinters.dailyCountForecast(df, "event_type", "ts", horizon = 3)
      .orderBy("h").collect()
    assert(f.map(_.getAs[Long]("forecast_micro")).toSeq ==
      Seq(70000000L, 80000000L, 90000000L))
    assert(f.head.getAs[Long]("trend_micro") == 10000000L)
  }

  test("forecast trend stays exact floor arithmetic when negative") {
    // y = 60, 50, ..., 10: declining series -> negative trend; the fold
    // must FLOOR (floorDiv), not truncate toward zero
    val df = (1 to 6).flatMap(d => ev(d, 10 * (7 - d), "x")).toDF("event_type", "ts")
    val f = HoltWinters.dailyCountForecast(df, "event_type", "ts", horizon = 1)
      .collect().head
    val ys = (1 to 6).map(d => 10L * (7 - d) * 1000000L)
    var l = ys.head; var b = ys(1) - ys.head
    ys.tail.foreach { y =>
      val ln = Math.floorDiv(y + 4L * (l + b), 5L)
      b = Math.floorDiv(ln - l + 9L * b, 10L)
      l = ln
    }
    assert(b < 0)
    assert(f.getAs[Long]("level_micro") == l)
    assert(f.getAs[Long]("trend_micro") == b)
    assert(f.getAs[Long]("forecast_micro") == l + b)
  }
}
