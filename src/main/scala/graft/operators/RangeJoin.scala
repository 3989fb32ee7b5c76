package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed POINT-IN-INTERVAL range join — pair every point row with
  * the interval rows containing its timestamp. Spark plans a raw
  * `p.ts BETWEEN i.start AND i.end` predicate as a broadcast
  * nested-loop (fine for small interval tables) or, for two large
  * inputs, a cartesian — O(|P|·|I|) comparisons.
  *
  * This implementation buckets time at a caller-chosen granularity:
  * each interval explodes to the buckets it overlaps, each point keys
  * by its single bucket, and a plain EQUI-join on the bucket id feeds
  * the exact BETWEEN filter. Cost: |I| · (avg interval span / bucket)
  * exploded rows, one hash shuffle on the bucket id, and only
  * same-bucket candidate pairs ever evaluated. A point's bucket is
  * unique and an interval covers each of its buckets once, so a
  * qualifying (point, interval) pair meets in EXACTLY one bucket — no
  * dedup shuffle after the join.
  *
  * Choose `bucketSeconds` near the typical interval span: much larger
  * buckets admit more false candidates (filtered, but scanned); much
  * smaller ones multiply the interval explosion. Hot buckets (dense
  * periods) are AQE-splittable like any skewed equi-join.
  *
  * Inclusive on both endpoints, matching SQL BETWEEN.
  */
object RangeJoin {

  /** @param points    frame with a timestamp column `pointTs`
    * @param intervals frame with `startCol`/`endCol` timestamp bounds
    *                  (rows with end < start are dropped)
    * @param bucketSeconds bucketing granularity in seconds
    */
  def pointInInterval(
      points: DataFrame, pointTs: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val clash = intervals.columns.toSet.intersect(points.columns.toSet)
    require(clash.isEmpty, s"point/interval column names collide: $clash")
    require(!points.columns.contains("__bucket") && !intervals.columns.contains("__bucket"),
      "__bucket column name is reserved by the range join")
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(unix_seconds(c.cast("timestamp")) / bucketSeconds)
    val b = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    val p = points.withColumn("__bucket", bucketOf(col(pointTs)))
    p.join(b, Seq("__bucket"))
      .filter(col(pointTs).cast("timestamp").between(
        col(startCol).cast("timestamp"), col(endCol).cast("timestamp")))
      .drop("__bucket")
  }
}
