package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quantile BUCKETING by the value distribution — NTILE's semantics at
  * scale, without NTILE's plan: ranking every row (a global sort, and
  * ties split arbitrarily across buckets) is replaced by VALUE-BASED
  * bucket bounds from the count histogram, so equal values always land
  * in the same bucket and no corpus-sized ordering exists anywhere.
  *
  * Bounds are the discrete (type-1) quantiles, all-integer: over the
  * (value, count) histogram with cumulative counts, bound_d is the
  * smallest value whose cumulative count covers fraction d/n of rows —
  * `cum · nBuckets ≥ d · N` avoids division entirely. A row's bucket
  * is 1 + #bounds strictly below its value. With heavy ties the
  * buckets are intentionally UNEVEN (all ties go together — the
  * "equal values, equal treatment" contract NTILE cannot give).
  *
  * Reference scope: the reference bins durations ad hoc in pandas;
  * this is the distribution-driven binning (feature bucketing,
  * per-decile reporting) that scales.
  *
  * Scale shape: one (value)-keyed histogram aggregation (state =
  * distinct-value count, the [[ExactPercentiles]] domain contract),
  * one window over that HISTOGRAM (bounded), and a 1-row broadcast of
  * the bounds back onto the corpus — assignment is map-side, zero
  * shuffle beyond the histogram build.
  */
object QuantileBucket {

  /** The 1-row discrete-quantile bounds frame (`__b1`..`__b{k-1}`) of
    * `df`'s `valueCol` distribution — separable so a REFERENCE
    * population's bounds can bucket a different population (the drift
    * comparison, q185).
    */
  def bounds(df: DataFrame, valueCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, "need at least 2 buckets")
    val hist = df.groupBy(col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__cnt"))
    val cum = hist
      .withColumn("__cum", sum("__cnt").over(Window.orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum("__cnt").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val boundAggs = (1 until nBuckets).map { d =>
      min(when(col("__cum") * nBuckets >= lit(d.toLong) * col("__n"), col("__v")))
        .as(s"__b$d")
    }
    cum.agg(boundAggs.head, boundAggs.tail: _*)
  }

  /** Adds `bucket` (1..nBuckets) to `df` by the given 1-row `boundsDf`
    * (broadcast; assignment is map-side). */
  def assignWithBounds(
      df: DataFrame, valueCol: String, boundsDf: DataFrame,
      nBuckets: Int): DataFrame = {
    val bucketExpr = (1 until nBuckets)
      .map(d => when(col(valueCol) > col(s"__b$d"), 1L).otherwise(0L))
      .reduce(_ + _) + 1L
    df.crossJoin(broadcast(boundsDf)) // 1-row bounds, not a data-sized cross
      .withColumn("bucket", bucketExpr)
      .drop((1 until nBuckets).map(d => s"__b$d"): _*)
  }

  /** Adds `bucket` (1..nBuckets) to `df` by the distribution of its own
    * `valueCol` (integer-valued, non-null). */
  def assignByDistribution(
      df: DataFrame, valueCol: String, nBuckets: Int): DataFrame =
    assignWithBounds(df, valueCol, bounds(df, valueCol, nBuckets), nBuckets)
}
