package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

/** [[Cusum.alarms]] — two-phase distributed CUSUM equals the
  * sequential recurrence.
  */
class CusumSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def run(rows: Seq[(Long, String, Timestamp, Long)], k: Long, h: Long,
      bucket: Long): Map[Long, Long] =
    Cusum.alarms(rows.toDF("id", "g", "ts", "v"), Seq("g"), "ts", "id", "v",
        k, h, bucket)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cusum")).toMap

  private def sequential(vals: Seq[(Long, Long)], k: Long): Map[Long, Long] = {
    var s = 0L
    vals.map { case (id, v) =>
      s = math.max(0L, s + v - k)
      id -> s
    }.toMap
  }

  test("matches the sequential recurrence on an irregular series, across bucket sizes") {
    val vals = (0L until 300L).map(i => (i, (i * 7919L) % 40L))
    val rows = vals.map { case (i, v) => (i, "g", ts(i * 100L), v) }
    val ref = sequential(vals, k = 20L).filter(_._2 > 120L)
    assert(ref.nonEmpty)
    for (bucket <- Seq(1000L, 3600L, 1000000L)) {
      assert(run(rows, 20L, 120L, bucket) === ref, s"bucket=$bucket diverged")
    }
  }

  test("a planted level shift raises alarms after the shift and nowhere before") {
    val rows = (0L until 200L).map { i =>
      val v = if (i < 100) 10L else 35L // k = 20: drifts to 0 before, climbs after
      (i, "g", ts(i * 60L), v)
    }
    val got = run(rows, 20L, 100L, 3600L)
    assert(got.nonEmpty)
    assert(got.keys.min > 100L, s"alarm before the shift: ${got.keys.min}")
  }

  test("groups are isolated: a shift in one group never alarms another") {
    val rows = (0L until 100L).map(i => (i, "calm", ts(i * 60L), 5L)) ++
      (100L until 200L).map(i => (i, "shift", ts((i - 100) * 60L), 50L))
    val got = Cusum.alarms(rows.toDF("id", "g", "ts", "v"), Seq("g"), "ts", "id",
        "v", k = 20L, threshold = 100L, bucketSeconds = 3600L)
      .collect().map(r => r.getAs[String]("g")).toSet
    assert(got === Set("shift"))
  }

  test("result is partitioning-invariant") {
    val vals = (0L until 150L).map(i => (i, (i * 31L) % 45L))
    val rows = vals.map { case (i, v) => (i, "g", ts(i * 50L), v) }
    val a = Cusum.alarms(rows.toDF("id", "g", "ts", "v").repartition(13),
      Seq("g"), "ts", "id", "v", 20L, 80L, 500L)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("cusum"))).toSet
    val b = Cusum.alarms(rows.toDF("id", "g", "ts", "v").coalesce(1),
      Seq("g"), "ts", "id", "v", 20L, 80L, 500L)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("cusum"))).toSet
    assert(a === b && a.nonEmpty)
  }
}
