package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Integer autocorrelation (ACF) of per-key daily event-count series —
  * the seasonality probe a pipeline runs before picking resample
  * horizons or anomaly windows (reference scope: the reference has no
  * time-series analysis; extension surface beside [[TrendOls]] /
  * [[Cusum]] / [[DecayScore]]).
  *
  * Exactness contract: the series is the ZERO-FILLED daily count over
  * the global [min day, max day] span (so every key sees the same
  * regular grid), deviations are taken around the FLOORED integer mean
  * `mu = S div n`, and the lag-k coefficient is emitted in integer
  * micro-units:
  *
  *   acf_micro(k) = (num_k * 1e6 + 2e6 * den) div den - 2e6,
  *     num_k = sum_{i<=n-k} d_i * d_{i+k},   den = sum d_i^2
  *
  * |num_k| <= den by Cauchy-Schwarz, so the offset keeps the dividend
  * non-negative and truncating division IS floor on both engines (the
  * q173 signed-division rule). All sums are exact long arithmetic —
  * int64-safe while n * maxDailyCount^2 * 1e6 < 2^63 (daily counts to
  * ~5e4 on a year span; larger scales lift the sums to decimal(38,0)).
  * A constant series (den = 0) yields NULL coefficients.
  *
  * Scale shape: one (key, day) count aggregate (map-side combined),
  * a policy-sized spine (keys x days) zero-fill join, and ONE
  * per-key window carrying all maxLag leads — the corpus is touched
  * exactly once; everything after the first aggregate is
  * spine-sized.
  */
object Acf {

  /** The zero-filled (key, day-index, count) grid over the global day
    * span: every key gets one row per day in [min, max] of `dayCol`'s
    * underlying timestamps, `i` = days since the global minimum.
    * Shared by [[dailyCountAcf]] and [[HoltWinters]].
    */
  def dailyCountSpine(ev: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val counts = ev
      .select(col(keyCol).as("k"), to_date(col(tsCol).cast("timestamp")).as("d"))
      .groupBy("k", "d").agg(count(lit(1)).as("c"))
    val bounds = counts.agg(min("d").as("lo"), max("d").as("hi"))
    val spine = counts.select("k").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("k"), explode(sequence(col("lo"), col("hi"))).as("d"),
        col("lo"))
    spine.join(counts, Seq("k", "d"), "left")
      .select(col("k"), datediff(col("d"), col("lo")).cast("long").as("i"),
        coalesce(col("c"), lit(0L)).as("c"))
  }

  /** ACF of the daily count series per key, lags 1..maxLag. Output:
    * (key, lag, n_days, acf_micro), one row per key per lag.
    */
  def dailyCountAcf(ev: DataFrame, keyCol: String, tsCol: String,
      maxLag: Int): DataFrame = {
    val grid = dailyCountSpine(ev, keyCol, tsCol)
    val stats = grid.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("c").as("s"))
      .select(col("k"), col("n"), expr("s div n").as("mu"))
    val dev = grid.join(broadcast(stats), Seq("k"))
      .select(col("k"), col("i"), col("n"), (col("c") - col("mu")).as("dv"))
    val w = Window.partitionBy("k").orderBy("i")
    // d * lead_k(d) is NULL past the series end, which sum() skips —
    // exactly the i <= n-k terms of num_k; one window exchange carries
    // every lag's lead
    val withLeads = (1 to maxLag).foldLeft(dev) { (df, k) =>
      df.withColumn(s"p$k", col("dv") * lead(col("dv"), k).over(w))
    }
    val aggs = Seq(max("n").as("n_days"), sum(col("dv") * col("dv")).as("den")) ++
      (1 to maxLag).map(k => sum(col(s"p$k")).as(s"num$k"))
    val agg = withLeads.groupBy("k").agg(aggs.head, aggs.tail: _*)
    agg
      .select(col("k"), col("n_days"), col("den"),
        posexplode(array((1 to maxLag).map(k => col(s"num$k")): _*)))
      .select(col("k").as(keyCol), (col("pos") + 1).cast("long").as("lag"),
        col("n_days"),
        when(col("den") === 0, lit(null).cast("long"))
          .otherwise(expr("(col * 1000000 + 2000000 * den) div den") -
            lit(2000000L)).as("acf_micro"))
  }
}
