package graft.operators

import graft.SparkTestBase

/** [[Skyline.skyline2d]] — dominance filter via the x-group frontier. */
class SkylineSpec extends SparkTestBase {
  import spark.implicits._

  private def sky(pts: Seq[(Long, Long, Long)]): Set[Long] =
    Skyline.skyline2d(pts.toDF("id", "x", "y"), "x", "y")
      .collect().map(_.getAs[Long]("id")).toSet

  test("staircase frontier survives; interior points fall") {
    val pts = Seq(
      (1L, 1L, 9L), (2L, 3L, 5L), (3L, 6L, 2L), // frontier
      (4L, 3L, 9L),  // beaten by (1,9)? x 3>1, y 9=9 -> dominated by id1
      (5L, 6L, 5L),  // dominated by id2 (3<=6, 5<=5, strict on x)
      (6L, 7L, 3L))  // dominated by id3
    assert(sky(pts) === Set(1L, 2L, 3L))
  }

  test("exact duplicates are mutually undominated — both survive") {
    val pts = Seq((1L, 2L, 2L), (2L, 2L, 2L), (3L, 5L, 5L))
    assert(sky(pts) === Set(1L, 2L))
  }

  test("same-x ties: only the minimal y survives (strict-y dominance)") {
    val pts = Seq((1L, 4L, 7L), (2L, 4L, 3L), (3L, 4L, 3L))
    assert(sky(pts) === Set(2L, 3L))
  }

  test("equal-y across x: only the smallest x survives (strict-x dominance)") {
    val pts = Seq((1L, 1L, 5L), (2L, 2L, 5L), (3L, 3L, 5L))
    assert(sky(pts) === Set(1L))
  }

  test("matches the all-pairs reference on an irregular cloud") {
    val pts = (0L until 400L).map(i =>
      (i, (i * 7919L) % 60L, (i * 104729L) % 500L))
    val brute = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, bx, by) =>
        bx <= x && by <= y && (bx < x || by < y)
      }
    }.map(_._1).toSet
    assert(sky(pts) === brute)
    assert(brute.nonEmpty && brute.size < pts.size)
  }
}
