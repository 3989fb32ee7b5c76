package graft.operators

import graft.SparkTestBase

/** [[OrderStat]] — exact rank selection by bounded radix histograms:
  * every rank against a sorted-array reference, sign/extreme values,
  * duplicates, and the fast failure past the row count.
  */
class OrderStatSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic mixed-sign fixture with duplicates and both extremes
  private lazy val values: Seq[Long] = {
    val base = (0 until 200).map(i => (i * 2654435761L) ^ (i << 21) * -7L)
    base ++ base.take(40) ++ // planted duplicates
      Seq(Long.MinValue, Long.MaxValue, 0L, -1L, 1L, Long.MinValue)
  }
  private lazy val df = values.toDF("v")
  private lazy val sorted = values.sorted

  test("kthSmallest matches the sorted array at every rank") {
    val ranks = Seq(1, 2, 3, 40, 41, 123, values.size - 1, values.size)
    ranks.foreach { k =>
      assert(OrderStat.kthSmallest(df, "v", k.toLong) == sorted(k - 1), s"rank $k")
    }
  }

  test("kthLargest matches the descending sorted array at every rank") {
    val desc = sorted.reverse
    val ranks = Seq(1, 2, 7, 100, values.size)
    ranks.foreach { k =>
      assert(OrderStat.kthLargest(df, "v", k.toLong) == desc(k - 1), s"rank $k")
    }
  }

  test("duplicates count as distinct ranks (the boundary-tie contract)") {
    val d = Seq(5L, 5L, 5L, 2L, 9L).toDF("v")
    assert(OrderStat.kthSmallest(d, "v", 2) == 5L)
    assert(OrderStat.kthSmallest(d, "v", 4) == 5L)
    assert(OrderStat.kthLargest(d, "v", 2) == 5L)
    assert(OrderStat.kthLargest(d, "v", 5) == 2L)
  }

  test("a rank past the row count fails fast, not silently") {
    val d = Seq(1L, 2L).toDF("v")
    intercept[IllegalArgumentException] {
      OrderStat.kthSmallest(d, "v", 3)
    }
  }

  test("integer (non-long) columns participate via order-preserving cast") {
    val d = Seq(3, -8, 3, 11).toDF("v")
    assert(OrderStat.kthSmallest(d, "v", 1) == -8L)
    assert(OrderStat.kthLargest(d, "v", 1) == 11L)
  }

  test("a non-integer column is rejected") {
    val d = Seq(1.5, 2.5).toDF("v")
    intercept[IllegalArgumentException] {
      OrderStat.kthSmallest(d, "v", 1)
    }
  }
}
