package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT interpolated per-group percentiles with BOUNDED state, for
  * integer-valued metrics (token counts, lengths, degree counts …).
  *
  * Spark's exact `percentile` aggregate is a TypedImperativeAggregate
  * that buffers EVERY group member's value in executor memory — the one
  * aggregate shape that cannot survive billion-row groups. For a metric
  * with a bounded set of DISTINCT values, the same exact result falls
  * out of a (group, value) COUNT HISTOGRAM: one partial-aggregating
  * shuffle whose state is the distinct-value count, then window
  * cumulative sums over the tiny histogram and the standard
  * interpolation — for rank r = p·(n−1), x_lo/x_hi the values holding
  * ranks ⌊r⌋/⌈r⌉, result = x_lo + (r − ⌊r⌋)·(x_hi − x_lo). This is the
  * formula `percentile` and DuckDB's QUANTILE_CONT use, so results are
  * bit-compatible modulo final rounding (q45's oracle hash-matches).
  *
  * Use `percentile_approx` instead when the value domain is continuous
  * or unbounded — the histogram is only smaller than the data when
  * values repeat.
  */
object ExactPercentiles {

  /** One row per group: `<name> double` for every (name, p) in `ps`
    * (rounded to `roundScale`), plus `max_<valueCol>` and `n_<valueCol>`.
    * A group whose values are ALL null is kept — null percentiles, null
    * max, n = 0 — exactly as `percentile` / DuckDB QUANTILE_CONT would.
    */
  def byGroup(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[(String, Double)], roundScale: Int = 6): DataFrame = {
    require(ps.nonEmpty, "need at least one percentile")
    val gs = groupCols.map(col)
    // NULL values are kept through the histogram but counted as ZERO —
    // matching `percentile`/QUANTILE_CONT, which ignore null values yet
    // KEEP a group whose values are all null (it surfaces with null
    // percentiles and n = 0). Filtering nulls before the groupBy would
    // silently drop such groups. A null histogram row can never be
    // selected as a bound: it contributes 0 to every cumulative count
    // (nulls sort first) and `min(when(…, value))` ignores null values.
    val hist = df
      .groupBy(gs :+ col(valueCol): _*)
      .agg(count(col(valueCol)).as("cnt")) // count(col) is 0 for the null-value row
    val cum = hist
      .withColumn("cum", sum("cnt").over(
        Window.partitionBy(gs: _*).orderBy(valueCol)))
      .withColumn("n", sum("cnt").over(Window.partitionBy(gs: _*)))
    def rank(p: Double): Column = lit(p) * (col("n") - 1).cast("double")
    val aggs = ps.flatMap { case (nm, p) => Seq(
      min(when(col("cum") > floor(rank(p)), col(valueCol))).as(s"${nm}_lo"),
      min(when(col("cum") > ceil(rank(p)), col(valueCol))).as(s"${nm}_hi"))
    } ++ Seq(max(col(valueCol)).as(s"max_$valueCol"), max(col("n")).as(s"n_$valueCol"))
    val bounds = cum.groupBy(gs: _*).agg(aggs.head, aggs.tail: _*)
    val outCols = gs ++ ps.map { case (nm, p) =>
      val r = lit(p) * (col(s"n_$valueCol") - 1).cast("double")
      round(col(s"${nm}_lo") + (r - floor(r)) * (col(s"${nm}_hi") - col(s"${nm}_lo")),
        roundScale).as(nm)
    } ++ Seq(col(s"max_$valueCol"), col(s"n_$valueCol"))
    bounds.select(outCols: _*)
  }
}
