package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.TrendOls

/** q149/q156's exact-OLS operator: a planted perfect line recovers its
  * slope and intercept exactly; the statistics are partition-count-
  * independent and merge by SUM (the property the streaming drain
  * stands on).
  */
class TrendOlsSpec extends SparkTestBase {
  import spark.implicits._

  private val t0 = TrendOls.epoch20240101

  test("a perfect line recovers its slope and intercept exactly") {
    // y = 2x + 500 centi-units -> slope 2*864 value-units/day, intercept 5.0
    val rows = Seq(0L, 10L, 25L, 60L, 3600L, 86400L).map { dx =>
      (new Timestamp((t0 + dx) * 1000L), "click", (2.0 * dx + 500.0) / 100.0)
    }
    val r = TrendOls.finish(TrendOls.sufficientStats(TrendOls.base(
      rows.toDF("ts", "event_type", "value")))).collect()(0)
    assert(r.getDouble(2) == 1728.0, s"slope ${r.getDouble(2)}")
    assert(r.getDouble(3) == 5.0, s"intercept ${r.getDouble(3)}")
  }

  test("statistics are partition-count-independent and SUM-mergeable") {
    val rows = (0 until 500).map { i =>
      (new Timestamp((t0 + i * 37L) * 1000L), s"t${i % 3}", (i % 89) / 4.0)
    }
    val df = rows.toDF("ts", "event_type", "value")
    val one = TrendOls.sufficientStats(TrendOls.base(df.repartition(1)))
      .orderBy("event_type").collect().toSeq
    val many = TrendOls.sufficientStats(TrendOls.base(df.repartition(7)))
      .orderBy("event_type").collect().toSeq
    assert(one == many)
    // batch-split merge: stats(A) + stats(B) == stats(A ∪ B), per column
    val (a, b) = (df.filter(col("value") < 10), df.filter(col("value") >= 10))
    val merged = TrendOls.sufficientStats(TrendOls.base(a))
      .unionByName(TrendOls.sufficientStats(TrendOls.base(b)))
      .groupBy("event_type")
      .agg(sum("n").as("n"), sum("sx").as("sx"), sum("sy").as("sy"),
        sum("sxx").as("sxx"), sum("sxy").as("sxy"))
      .orderBy("event_type").collect().toSeq
    assert(merged.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))) ==
      one.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))))
  }
}
