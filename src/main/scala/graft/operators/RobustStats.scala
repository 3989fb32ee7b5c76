package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ROBUST per-group outlier detection — median / MAD (median absolute
  * deviation), the rule that survives what z-scores cannot: mean and
  * stddev are themselves dragged by the outliers they're meant to
  * find (a single 50× spike moves the mean; it moves the median not at
  * all). The curation use is metric anomaly gating: latency spikes,
  * corrupted-measurement rows, price glitches.
  *
  * All arithmetic is INTEGER so the decision is bit-exact on both
  * engines: for integer values v, `med2 = lo + hi` is TWICE the
  * interpolated median (lo/hi the values at ranks ⌊r⌋/⌈r⌉, r =
  * 0.5·(n−1) — for odd n lo = hi), `dev2 = |2v − med2|` is twice the
  * absolute deviation, `mad4 = lo₂ + hi₂` over dev2 is FOUR times the
  * MAD, and the outlier rule dev > k·MAD becomes `2·dev2 > k·mad4` —
  * no float ever enters.
  *
  * Reference scope: the reference's EDA is df.describe() (mean/std);
  * extension with the robust form that scales.
  *
  * Scale shape: two (group, value)-keyed HISTOGRAM aggregations (the
  * [[ExactPercentiles]] pattern — state is the DISTINCT-value count,
  * bounded by the metric's domain, e.g. the cent range of a price),
  * each followed by a per-group window over that histogram; the
  * group-level med2/mad4 tables broadcast back. Use this for bounded
  * integer domains; a genuinely continuous unbounded metric needs the
  * approximate-quantile sketch (q112) instead.
  */
object RobustStats {

  /** (groupCols..., med2) — twice the interpolated median of `v`. */
  private def twiceMedian(df: DataFrame, gs: Seq[String], v: String,
      out: String): DataFrame = {
    val g = gs.map(col)
    val hist = df.groupBy(g :+ col(v): _*).agg(count(lit(1)).as("cnt"))
    val cum = hist
      .withColumn("cum", sum("cnt").over(Window.partitionBy(g: _*).orderBy(v)))
      .withColumn("n", sum("cnt").over(Window.partitionBy(g: _*)))
    val r: Column = lit(0.5) * (col("n") - 1).cast("double")
    cum.groupBy(g: _*)
      .agg((min(when(col("cum") > floor(r), col(v)))
        + min(when(col("cum") > ceil(r), col(v)))).as(out))
  }

  /** Rows of `df` whose `valueCol` (integer, non-null) deviates from its
    * group median by more than `k` MADs, with the integer evidence
    * columns (`dev2`, `med2`, `mad4`) attached. Groups with mad4 = 0
    * (over half the values identical) flag every deviating row — the
    * standard MAD degeneracy, left to the caller's k.
    */
  def madOutliers(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Long = 3L): DataFrame = {
    require(k > 0, "k must be positive")
    val gs = groupCols
    val med = twiceMedian(df, gs, valueCol, "med2")
    // pinned: feeds both the MAD histogram and the final outlier join
    val withDev = CacheScope.pin(
      df.join(broadcast(med), gs)
        .withColumn("dev2", abs(lit(2) * col(valueCol) - col("med2"))),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mad = twiceMedian(withDev, gs, "dev2", "mad4")
    withDev.join(broadcast(mad), gs)
      .filter(lit(2) * col("dev2") > lit(k) * col("mad4"))
  }
}
