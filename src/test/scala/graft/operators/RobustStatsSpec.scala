package graft.operators

import graft.SparkTestBase

/** [[RobustStats.madOutliers]] — integer median/MAD outlier rule. */
class RobustStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def outliers(rows: Seq[(Long, String, Long)], k: Long): Set[Long] =
    RobustStats.madOutliers(rows.toDF("id", "g", "v"), Seq("g"), "v", k)
      .collect().map(_.getAs[Long]("id")).toSet

  test("a 50x spike is flagged; the bulk is not (odd n: exact median)") {
    // g: values 10,11,12,13,14 (median 12, MAD 1) + spike 600
    val rows = Seq(10L, 11L, 12L, 13L, 14L, 600L).zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }
    // med over 6 values: (12+13)/2 = 12.5 → med2 = 25; devs2 = |2v-25| =
    // 5,3,1,1,3,1175 → sorted 1,1,3,3,5,1175 → mad4 = 3+3 = 6 (MAD 1.5)
    assert(outliers(rows, 3L) === Set(5L))
  }

  test("median and MAD are unmoved by the outlier itself (vs mean/std which are not)") {
    val base = Seq(10L, 11L, 12L, 13L, 14L)
    val withSpike = (base :+ 100000L).zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
    val got = RobustStats.madOutliers(withSpike.toDF("id", "g", "v"), Seq("g"), "v", 3L)
      .select("med2", "mad4").distinct().collect()
    assert(got.length === 1)
    // same med2/mad4 as the 600-spike case: the magnitude of the spike is invisible
    assert(got.head.getLong(0) === 25L && got.head.getLong(1) === 6L)
  }

  test("groups are independent; a clean group flags nothing") {
    val rows = Seq((1L, "a", 10L), (2L, "a", 11L), (3L, "a", 12L), (4L, "a", 500L),
      (5L, "b", 7L), (6L, "b", 8L), (7L, "b", 9L))
    assert(outliers(rows, 3L) === Set(4L))
  }

  test("mad4 = 0 degeneracy: every deviating row flags") {
    val rows = Seq((1L, "g", 5L), (2L, "g", 5L), (3L, "g", 5L), (4L, "g", 6L))
    assert(outliers(rows, 100L) === Set(4L))
  }

  test("matches a driver-side float reference on irregular deterministic data") {
    val vals = (0 until 501).map(i => (i * 7919L) % 1000L + (if (i % 97 == 0) 50000L else 0L))
    val rows = vals.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      val r = 0.5 * (n - 1); val lo = s(r.toInt); val hi = s(math.ceil(r).toInt)
      lo + (r - math.floor(r)) * (hi - lo)
    }
    val med = medianOf(vals.map(_.toDouble))
    val mad = medianOf(vals.map(v => math.abs(v - med)))
    val want = rows.filter { case (_, _, v) => math.abs(v - med) > 3.0 * mad }.map(_._1).toSet
    assert(outliers(rows, 3L) === want)
    assert(want.nonEmpty)
  }
}
