package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Holt double exponential smoothing (level + trend) over the per-key
  * daily count series, in exact integer micro-units — the short-horizon
  * forecaster a pipeline runs on ingest volume to provision the next
  * week's capacity (reference scope: no forecasting in the reference;
  * extension surface beside [[Acf]] / [[TrendOls]]).
  *
  * Exactness contract: y_t = dailyCount * 1e6 micro-events on the
  * zero-filled global day grid ([[Acf.dailyCountSpine]]). With
  * alpha = 1/5 and beta = 1/10 as exact rationals, every step is
  * integer floor arithmetic (Math.floorDiv here, `//` in the DuckDB
  * twin — both true floor on negatives, the q173 rule):
  *
  *   l_1 = y_1,  b_1 = y_2 - y_1
  *   l_t = floor((y_t + 4 * (l_{t-1} + b_{t-1})) / 5)
  *   b_t = floor((l_t - l_{t-1} + 9 * b_{t-1}) / 10)
  *   forecast(h) = l_n + h * b_n,  h = 1..horizon
  *
  * The recurrence is an ordered per-key fold like the q204 token
  * bucket, but it runs on the SPINE, not the corpus: the corpus pays
  * one (key, day) count aggregate; the fold touches keys x days rows
  * (policy-sized — 5 keys x span days here), so the sequential step
  * is O(days) per key no matter how many events land in a day. Keys
  * whose grid has fewer than 2 days are skipped (trend undefined).
  */
object HoltWinters {

  /** Forecast the next `horizon` daily counts per key. Output:
    * (key, h, forecast_micro, level_micro, trend_micro) — level/trend
    * are the final smoothed state, identical across a key's rows.
    */
  def dailyCountForecast(ev: DataFrame, keyCol: String, tsCol: String,
      horizon: Int): DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    val grid: Dataset[(String, Long, Long)] = Acf.dailyCountSpine(ev, keyCol, tsCol)
      .select(col("k").cast("string"), col("i"), col("c"))
      .as[(String, Long, Long)]
    grid.groupByKey(_._1).flatMapGroups { (k, rows) =>
      val ys = rows.toSeq.sortBy(_._2).map(_._3 * 1000000L)
      if (ys.size < 2) Iterator.empty
      else {
        var l = ys.head
        var b = ys(1) - ys.head
        ys.tail.foreach { y =>
          val lNext = Math.floorDiv(y + 4L * (l + b), 5L)
          b = Math.floorDiv(lNext - l + 9L * b, 10L)
          l = lNext
        }
        (1 to horizon).iterator.map(h => (k, h.toLong, l + h * b, l, b))
      }
    }.toDF(keyCol, "h", "forecast_micro", "level_micro", "trend_micro")
  }
}
