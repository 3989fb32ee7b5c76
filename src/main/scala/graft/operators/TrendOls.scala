package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed OLS (q149/q156): per-group simple linear
  * regression through integer SUFFICIENT STATISTICS — x re-centered to
  * whole seconds, y in centi-units, and (n, Σx, Σy, Σx², Σxy) as exact
  * long sums, so the statistics are map-side combinable, mergeable
  * across micro-batches (SUM merge law — which is why the streaming
  * drain q156 shares q149's oracle verbatim), and shuffle-order-
  * independent where the float `regr_slope` built-ins are not. Doubles
  * appear only in [[finish]]'s two fixed expressions, replayed
  * verbatim by the oracle.
  *
  * Bounds: |x| ≤ 2.6e6 over the feed's 31 days, so Σx² fits a long to
  * ~1e6 rows/group and the decimal(38) combination to ~1e24 (ANSI-
  * checked, not silent). A wider time range re-centers per a coarser
  * epoch or scales x to minutes — the statistics shape is unchanged.
  */
object TrendOls {

  val epoch20240101 = 1704067200L

  /** (event_type, x, y) projection: x = seconds since 2024-01-01,
    * y = centi-units of `value`.
    */
  def base(events: DataFrame): DataFrame =
    events.select(col("event_type"),
      (unix_seconds(col("ts").cast("timestamp")) - lit(epoch20240101)).as("x"),
      round(col("value") * 100).cast("long").as("y"))

  /** The five sufficient statistics per group — exact, mergeable. */
  def sufficientStats(base: DataFrame): DataFrame =
    base.groupBy("event_type").agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))

  /** Slope (value-units/day) and intercept from the statistics — the
    * only floating-point step, a fixed expression shape.
    */
  def finish(stats: DataFrame): DataFrame = {
    val d = (c: String) => col(c).cast("decimal(38,0)")
    val num = (d("n") * d("sxy") - d("sx") * d("sy")).cast("double")
    val den = (d("n") * d("sxx") - d("sx") * d("sx")).cast("double")
    stats.select(col("event_type"), col("n").as("n_events"),
        round((num / den) * lit(864.0), 6).as("slope_per_day"),
        round((col("sy").cast("double") - (num / den) * col("sx").cast("double"))
          / col("n").cast("double") / lit(100.0), 6).as("intercept"))
      .orderBy("event_type")
  }
}
