package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed one-sided CUSUM change-point detection (Page 1954) —
  * the sequential quality-control statistic, made distributable
  * through its CLOSED FORM: with C_t the running sum of (x_t − k)
  * (k = allowed drift), the recurrence s_t = max(0, s_{t−1} + x_t − k)
  * equals
  *
  *   s_t = C_t − min(0, min_{j≤t} C_j)
  *
  * so the per-row statistic needs only a running SUM and a running MIN
  * — both prefix scans, both distributed with the [[SweepLine]]
  * two-phase trick: each (group, time-bucket) computes its within-
  * bucket scans in its own partition, and bucket-level carries (the
  * prefix sum entering the bucket, and the global min over all prior
  * buckets' points = min over buckets of carry-in + within-min) come
  * from one window over the per-group BUCKET TABLE, whose cardinality
  * is #buckets, never #rows. All arithmetic integer → bit-exact.
  *
  * Reference scope: no monitoring surface in the reference; extension
  * — the drift/level-shift alarm a feed-quality pipeline runs per
  * source (ingestion-rate collapse, metric corruption onset).
  *
  * Scale shape: one (group, bucket)-keyed exchange for the within
  * scans (bucketSeconds sizes a bucket's rows to a task — the per-key
  * window contract), one #buckets-per-group window + broadcast join
  * for carries. Never a per-group single-partition sort of the corpus.
  */
object Cusum {

  /** Alarm rows: every input row whose CUSUM statistic exceeds
    * `threshold`, with the statistic attached as `cusum`. Ordering
    * within a group is (tsCol, seqCol) — seqCol must make it unique
    * (determinism contract). `valueCol` integer; drift `k` subtracted
    * per observation.
    */
  def alarms(
      df: DataFrame, groupCols: Seq[String], tsCol: String, seqCol: String,
      valueCol: String, k: Long, threshold: Long,
      bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val gs = groupCols.map(col)
    val pts = ScaleOut(df)
      .withColumn("__d", col(valueCol) - lit(k))
      .withColumn("__b", floor(unix_seconds(col(tsCol).cast("timestamp")) / bucketSeconds))
    val wIn = Window.partitionBy(gs :+ col("__b"): _*)
      .orderBy(col(tsCol), col(seqCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = pts
      .withColumn("__rs", sum(col("__d")).over(wIn))
    val within2 = within
      .withColumn("__rm", min(col("__rs")).over(wIn))
    // bucket table: per-bucket delta total + whole-bucket min of the
    // within running sum (order-dependent, so it reads the windowed frame)
    val wB = Window.partitionBy(gs: _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketMins = within2.groupBy(gs :+ col("__b"): _*)
      .agg(min(col("__rm")).as("__minrs"), sum(col("__d")).as("__tot"))
    val carries = bucketMins
      .withColumn("__cin", coalesce(sum(col("__tot")).over(wB), lit(0L)))
      .withColumn("__gmprev", min(col("__cin") + col("__minrs")).over(wB))
      .select(gs ++ Seq(col("__b"), col("__cin"), col("__gmprev")): _*)
    val joined = within2.join(carries, groupCols :+ "__b")
      .withColumn("__S", col("__cin") + col("__rs"))
      .withColumn("__gmin",
        least(coalesce(col("__gmprev"), col("__cin") + col("__rm")),
          col("__cin") + col("__rm")))
      .withColumn("cusum", col("__S") - least(lit(0L), col("__gmin")))
    joined.filter(col("cusum") > threshold)
      .drop("__d", "__b", "__rs", "__rm", "__cin", "__gmprev", "__S", "__gmin", "__tot", "__minrs")
  }
}
