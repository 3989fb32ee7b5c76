package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series RESAMPLING: bucket an event stream to a fixed grid,
  * aggregate each bucket OHLC-style (open/high/low/close = first/max/
  * min/last value in event order), then DENSIFY the grid — emit every
  * bucket of the [min, max] span per group, carrying the last known
  * close forward across the empty ones (the "gap fill" every
  * time-series store exposes as `date_spine` + `LOCF`).
  *
  * Scale shape:
  *  - open/close are row-number selections over a window PARTITIONED BY
  *    (group, bucket) — the same keys the OHLC aggregation groups on,
  *    so the window's exchange is reused by the aggregate (one shuffle
  *    total for bucketing; the asc/desc orders are two sorts over it).
  *    Order within a bucket is (ts, id) — id breaks ties so the result
  *    is deterministic under any physical row order.
  *  - the spine derives from the AGGREGATED frame (one min/max row per
  *    group, then `sequence` + `explode`), so its size is
  *    groups × (time span / granularity) — a POLICY constant,
  *    independent of event volume. The spine-to-OHLC left join and the
  *    forward-fill window partition by group over that bounded frame;
  *    no operator after the first aggregation ever touches raw events.
  *  - the forward fill is `last(close, ignoreNulls)` over
  *    ROWS UNBOUNDED PRECEDING — one pass per group over spine rows.
  *
  * Values are SELECTED, never combined (no float arithmetic), so
  * results are bit-exact across engines.
  */
object Resample {

  /** OHLC-resample `events` onto a `bucketSeconds` grid per `groupCol`,
    * gap-filling the close forward. Output columns: groupCol,
    * `bucket_ts`, `open`, `high`, `low`, `close` (forward-filled),
    * `n_events` (0 on gap rows), `is_gap`.
    *
    * @param tsCol    event-time timestamp column
    * @param idCol    unique tie-break column (row identity)
    * @param valueCol numeric column to aggregate
    */
  def ohlcGapFill(
      events: DataFrame, groupCol: String, tsCol: String, idCol: String,
      valueCol: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val bucket = timestamp_seconds(
      floor(unix_seconds(col(tsCol).cast("timestamp")) / bucketSeconds) * bucketSeconds)
    val base = events.select(
      col(groupCol), bucket.as("bucket_ts"),
      col(tsCol).cast("timestamp").as("__ts"), col(idCol).as("__id"),
      col(valueCol).as("__v"))

    val byBucket = Window.partitionBy(col(groupCol), col("bucket_ts"))
    val asc = byBucket.orderBy(col("__ts").asc, col("__id").asc)
    val desc = byBucket.orderBy(col("__ts").desc, col("__id").desc)
    val ohlc = base
      .withColumn("__rna", row_number().over(asc))
      .withColumn("__rnd", row_number().over(desc))
      .groupBy(col(groupCol), col("bucket_ts"))
      .agg(
        max(when(col("__rna") === 1, col("__v"))).as("open"),
        max(col("__v")).as("high"),
        min(col("__v")).as("low"),
        max(when(col("__rnd") === 1, col("__v"))).as("close"),
        count(lit(1)).as("n_events"))

    val spine = ohlc
      .groupBy(col(groupCol))
      .agg(min(col("bucket_ts")).as("__lo"), max(col("bucket_ts")).as("__hi"))
      .select(col(groupCol), explode(
        sequence(col("__lo"), col("__hi"),
          expr(s"INTERVAL $bucketSeconds SECOND"))).as("bucket_ts"))

    val fill = Window.partitionBy(col(groupCol)).orderBy(col("bucket_ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(ohlc.withColumnRenamed("close", "__close"),
        Seq(groupCol, "bucket_ts"), "left")
      .select(
        col(groupCol), col("bucket_ts"),
        col("open"), col("high"), col("low"),
        last(col("__close"), ignoreNulls = true).over(fill).as("close"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("n_events").isNull.as("is_gap"))
  }

  /** LINEAR-INTERPOLATION gap fill — [[ohlcGapFill]]'s straight-line
    * sibling: an empty bucket between two observed closes takes the
    * value on the line between them, in INTEGER units with floor
    * division, so the fill is bit-exact. The blend runs on
    * +2^31-OFFSET values (offset·span divisible by span), which makes
    * the truncating `div` compute FLOOR even when the series moves
    * DOWN across the gap (next < prev ⇒ negative numerator — a direct
    * signed division would truncate toward zero; the q173 lesson).
    * Contract: |values| < 2^31.
    *
    * The spine starts and ends at observed buckets per group, so every
    * gap row has BOTH neighbors — no extrapolation case exists.
    *
    * Scale shape: identical to [[ohlcGapFill]] — one (group, bucket)
    * exchange for the closes, then spine-sized windows only (two
    * passes: one ascending for the previous observation, one
    * descending-frame for the next).
    */
  def linearGapFill(
      events: DataFrame, groupCol: String, tsCol: String, idCol: String,
      valueCol: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val Off = 1L << 31
    val bucket = timestamp_seconds(
      floor(unix_seconds(col(tsCol).cast("timestamp")) / bucketSeconds) * bucketSeconds)
    val base = events.select(
      col(groupCol), bucket.as("bucket_ts"),
      col(tsCol).cast("timestamp").as("__ts"), col(idCol).as("__id"),
      col(valueCol).as("__v"))
    val desc = Window.partitionBy(col(groupCol), col("bucket_ts"))
      .orderBy(col("__ts").desc, col("__id").desc)
    val closes = base
      .withColumn("__rnd", row_number().over(desc))
      .groupBy(col(groupCol), col("bucket_ts"))
      .agg(max(when(col("__rnd") === 1, col("__v"))).as("__close"),
        count(lit(1)).as("n_events"))
    val spine = closes
      .groupBy(col(groupCol))
      .agg(min(col("bucket_ts")).as("__lo"), max(col("bucket_ts")).as("__hi"))
      .select(col(groupCol), explode(
        sequence(col("__lo"), col("__hi"),
          expr(s"INTERVAL $bucketSeconds SECOND"))).as("bucket_ts"))
    // BOTH fills are running (UNBOUNDED PRECEDING) frames — the "next"
    // observation comes from a DESCENDING-order running last, because
    // Spark evaluates an UNBOUNDED FOLLOWING frame by re-aggregating
    // from every row to the partition end: O(rows²) per partition
    // (measured as a multi-minute hang on a 43k-row spine)
    val wPrev = Window.partitionBy(col(groupCol)).orderBy(col("bucket_ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col(groupCol)).orderBy(col("bucket_ts").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val obsTs = when(col("__close").isNotNull, col("bucket_ts"))
    spine
      .join(closes, Seq(groupCol, "bucket_ts"), "left")
      .withColumn("__pv", last(col("__close"), ignoreNulls = true).over(wPrev))
      .withColumn("__pt", last(obsTs, ignoreNulls = true).over(wPrev))
      .withColumn("__nv", last(col("__close"), ignoreNulls = true).over(wNext))
      .withColumn("__nt", last(obsTs, ignoreNulls = true).over(wNext))
      .withColumn("__i", expr(
        s"(unix_seconds(bucket_ts) - unix_seconds(__pt)) div $bucketSeconds"))
      .withColumn("__len", expr(
        s"(unix_seconds(__nt) - unix_seconds(__pt)) div $bucketSeconds"))
      .select(
        col(groupCol), col("bucket_ts"),
        when(col("__close").isNotNull, col("__close"))
          .otherwise(expr(
            s"((__pv + $Off) * (__len - __i) + (__nv + $Off) * __i) div __len - $Off"))
          .as("value_i"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("__close").isNull.as("is_gap"))
  }
}
