package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[SweepLine.peakConcurrency]] — two-phase distributed prefix sum. */
class SweepLineSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def peaks(iv: Seq[(Timestamp, Timestamp)], bucket: Long): Map[Long, Long] =
    SweepLine.peakConcurrency(iv.toDF("s", "e"), "s", "e", bucket)
      .collect().map(r => r.getTimestamp(0).getTime / 1000L -> r.getLong(1)).toMap

  test("overlapping intervals stack; half-open end does not overlap a same-instant start") {
    val got = peaks(Seq((ts(0), ts(10)), (ts(5), ts(15)), (ts(15), ts(20))), 3600L)
    // [0,10) and [5,15) overlap (peak 2); [15,20) starts exactly as [5,15) ends
    assert(got === Map(0L -> 2L))
  }

  test("carry-in flows across buckets (spanning interval, no endpoints in between)") {
    // [0, 7210): +1 in bucket 0, -1 in bucket 2; bucket 1 has no points
    val got = peaks(Seq((ts(0), ts(7210)), (ts(7205), ts(7300))), 3600L)
    assert(got.keySet === Set(0L, 7200L))
    assert(got(0L) === 1L)
    // bucket 2 sees: +1 at 7205 (run 1+carry 1 = 2), -1 at 7210, -1 at 7300
    assert(got(7200L) === 2L)
  }

  test("exact ties collapse to the post-tie value on peak") {
    // two starts at the same instant: peak must be 2, not 1
    val got = peaks(Seq((ts(100), ts(200)), (ts(100), ts(150))), 3600L)
    assert(got === Map(0L -> 2L))
  }

  test("matches a single-global-window reference on an irregular deterministic set") {
    val iv = (0L until 300L).map { i =>
      val s = (i * 7919L) % 50000L
      (ts(s), ts(s + 1L + (i * 104729L) % 9000L))
    }
    val bucket = 3600L
    val df = iv.toDF("s", "e")
    val pts = df.select(col("s").as("t"), lit(1L).as("d"))
      .unionByName(df.select(col("e").as("t"), lit(-1L).as("d")))
    val wAll = org.apache.spark.sql.expressions.Window.orderBy(col("t"), col("d"))
    val ref = pts.withColumn("run", sum(col("d")).over(wAll))
      .groupBy(floor(unix_seconds(col("t")) / bucket).as("b"))
      .agg(max(col("run")).as("peak"))
      .collect().map(r => r.getLong(0) * bucket -> r.getLong(1)).toMap
    assert(peaks(iv, bucket) === ref)
    assert(ref.size > 5, "gate set must span multiple buckets")
  }

  test("result is partitioning-invariant") {
    val iv = (0L until 100L).map(i => (ts(i * 37L % 5000L), ts(i * 37L % 5000L + 400L)))
    val df = iv.toDF("s", "e").repartition(13)
    val a = SweepLine.peakConcurrency(df, "s", "e", 1000L)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    val b = SweepLine.peakConcurrency(iv.toDF("s", "e").coalesce(1), "s", "e", 1000L)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    assert(a === b)
  }
}
