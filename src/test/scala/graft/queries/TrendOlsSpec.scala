package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** q149's exact-OLS shape on a planted perfect line: y = 2x + 500
  * centi-units (x in seconds) must recover slope 2·864 value-units/day
  * and intercept 5.0 exactly, independent of row order.
  */
class TrendOlsSpec extends SparkTestBase {
  import spark.implicits._

  test("a perfect line recovers its slope and intercept exactly") {
    val t0 = 1704067200L // 2024-01-01 UTC
    val rows = Seq(0L, 10L, 25L, 60L, 3600L, 86400L).map { dx =>
      (new Timestamp((t0 + dx) * 1000L), "click", (2.0 * dx + 500.0) / 100.0)
    }
    val ev = rows.toDF("ts", "event_type", "value")
    val base = ev.select(col("event_type"),
      (unix_seconds(col("ts").cast("timestamp")) - lit(t0)).as("x"),
      round(col("value") * 100).cast("long").as("y"))
    val agg = base.groupBy("event_type").agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
    val d = (c: String) => col(c).cast("decimal(38,0)")
    val num = (d("n") * d("sxy") - d("sx") * d("sy")).cast("double")
    val den = (d("n") * d("sxx") - d("sx") * d("sx")).cast("double")
    val r = agg.select(
      round((num / den) * lit(864.0), 6).as("slope_per_day"),
      round((col("sy").cast("double") - (num / den) * col("sx").cast("double"))
        / col("n").cast("double") / lit(100.0), 6).as("intercept"))
      .collect()(0)
    assert(r.getDouble(0) == 1728.0, s"slope ${r.getDouble(0)}")
    assert(r.getDouble(1) == 5.0, s"intercept ${r.getDouble(1)}")
  }

  test("the sums are shuffle-partition-independent (exact longs)") {
    val t0 = 1704067200L
    val rows = (0 until 500).map { i =>
      (new Timestamp((t0 + i * 37L) * 1000L), s"t${i % 3}", (i % 89) / 4.0)
    }
    val mk = (parts: Int) => rows.toDF("ts", "event_type", "value")
      .repartition(parts)
      .select(col("event_type"),
        (unix_seconds(col("ts").cast("timestamp")) - lit(t0)).as("x"),
        round(col("value") * 100).cast("long").as("y"))
      .groupBy("event_type")
      .agg(sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .orderBy("event_type").collect().toSeq
    assert(mk(1) == mk(7))
  }
}
