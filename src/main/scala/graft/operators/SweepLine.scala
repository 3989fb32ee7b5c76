package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed SWEEP-LINE over intervals — peak concurrency per time
  * bucket, the interval-algebra aggregate behind capacity planning
  * ("how many sessions were open at once each hour"): every interval
  * contributes +1 at its start and −1 at its end (HALF-OPEN [s, e) —
  * an interval ending at t does not overlap one starting at t), the
  * running sum of deltas in time order IS the concurrency curve, and
  * the per-bucket peak is its max over the bucket's boundary points.
  *
  * Reference scope: no interval algebra in the reference; extension —
  * the q58/q164 range-join family covers point-lookups, this covers
  * the aggregate the same intervals feed.
  *
  * A naive running sum is ONE global window = a single-partition sort
  * of the whole corpus. The distributed form is a two-phase prefix
  * sum: deltas key by their time bucket, each bucket computes its
  * WITHIN-bucket running sum in its own partition, and the carry-in of
  * every bucket (the concurrency entering it — spanning intervals'
  * unmatched starts) comes from one window over the BUCKET-TOTAL
  * table, whose cardinality is #buckets, not #rows. Peers at an exact
  * (t, d) tie collapse under the default RANGE frame (the tied rows
  * all see the post-tie sum), identical in Spark and the oracle's SQL.
  *
  * Scale shape: one bucket-keyed exchange for the within sums, one
  * #buckets-sized window + broadcast join for the carries. Skewed
  * (dense) buckets are ordinary AQE-splittable aggregation keys —
  * but the within-bucket window itself is per-bucket sequential, so
  * `bucketSeconds` should be sized so one bucket's points fit a task
  * (the same contract as every per-key window in the engine).
  */
object SweepLine {

  /** Peak concurrency per bucket: (bucket_start timestamp, peak long).
    * Buckets with no interval ENDPOINTS are absent (the curve is
    * constant there — a consumer gap-fills with [[Resample]] if it
    * needs a dense grid). Peak is measured at the bucket's boundary
    * points: max over the running sum evaluated after each event.
    */
  def peakConcurrency(
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val iv = ScaleOut(intervals
      .select(col(startCol).cast("timestamp").as("s"),
        col(endCol).cast("timestamp").as("e"))
      .filter(col("e") > col("s")))
    val pts = iv.select(col("s").as("t"), lit(1L).as("d"))
      .unionByName(iv.select(col("e").as("t"), lit(-1L).as("d")))
      .withColumn("b", floor(unix_seconds(col("t")) / bucketSeconds))
    // phase 1: within-bucket running sum (default RANGE frame: exact
    // (t, d) peers collapse to the post-tie value on both engines)
    val wIn = Window.partitionBy("b").orderBy(col("t"), col("d"))
    val within = pts.withColumn("run_in", sum(col("d")).over(wIn))
    // phase 2: carry-in per bucket from the bucket-total table
    // (#buckets rows; the only global-ordered window in the plan)
    val wCarry = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = pts.groupBy("b").agg(sum(col("d")).as("tot"))
      .withColumn("carry", coalesce(sum(col("tot")).over(wCarry), lit(0L)))
      .select(col("b"), col("carry"))
    within.join(broadcast(carries), Seq("b"))
      .groupBy(col("b"))
      .agg(max(col("run_in") + col("carry")).as("peak"))
      .select(timestamp_seconds(col("b") * bucketSeconds).as("bucket_start"),
        col("peak"))
  }
}
