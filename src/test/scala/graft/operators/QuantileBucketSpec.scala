package graft.operators

import graft.SparkTestBase

/** [[QuantileBucket.assignByDistribution]] — value-based bucketing. */
class QuantileBucketSpec extends SparkTestBase {
  import spark.implicits._

  private def buckets(vals: Seq[Long], n: Int): Map[Long, Long] =
    QuantileBucket.assignByDistribution(
        vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v"),
        "v", n)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("bucket")).toMap

  test("uniform distinct values split evenly into quartiles") {
    val got = buckets((1L to 20L), 4)
    // bounds: cum*4 >= d*20 -> b1 = 5, b2 = 10, b3 = 15
    (0 until 20).foreach { i =>
      val v = i + 1L
      val expect = if (v <= 5) 1L else if (v <= 10) 2L else if (v <= 15) 3L else 4L
      assert(got(i.toLong) === expect, s"v=$v")
    }
  }

  test("ties always share a bucket (the NTILE contract this replaces cannot give)") {
    // 12 copies of the same value + 4 larger: the tie block floods
    // buckets 1-3; every tied row must get the SAME bucket
    val vals = Seq.fill(12)(7L) ++ Seq(8L, 9L, 10L, 11L)
    val got = buckets(vals, 4)
    val tieBuckets = (0 until 12).map(i => got(i.toLong)).toSet
    assert(tieBuckets.size === 1)
    assert(tieBuckets.head === 1L)
    assert(got(12L) === 4L) // 8 is above b3 (=7): cum*4>=3*16 -> 12*4 >= 48 -> b3=7
  }

  test("matches a sorted-reference assignment on irregular values") {
    val vals = (0 until 500).map(i => (i.toLong * 7919L) % 97L)
    val n = vals.length
    val sorted = vals.sorted
    def bound(d: Int, k: Int): Long = sorted.zipWithIndex
      .collectFirst { case (v, i) if (i + 1).toLong * k >= d.toLong * n => v }.get
    for (k <- Seq(4, 10)) {
      val bs = (1 until k).map(bound(_, k))
      val want = vals.zipWithIndex.map { case (v, i) =>
        i.toLong -> (1L + bs.count(v > _))
      }.toMap
      assert(buckets(vals, k) === want, s"k=$k")
    }
  }
}
