package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[SpatialJoin.proximityPairs]] — grid-bucketed proximity self-join. */
class SpatialJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def pairsOf(pts: Seq[(Long, Long, Long)], d: Long): Set[(Long, Long, Long)] =
    SpatialJoin.proximityPairs(pts.toDF("id", "x", "y"), "id", "x", "y", d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("boundary is inclusive: dist == maxDist kept, one unit beyond dropped") {
    val pts = Seq((1L, 0L, 0L), (2L, 0L, 10L), (3L, 0L, 21L))
    assert(pairsOf(pts, 10L) === Set((1L, 2L, 100L)))
  }

  test("pairs straddling a cell border are found (via the neighbor explode)") {
    // cell edge = d = 10: x=9 and x=11 live in different cells, dist 2
    val pts = Seq((1L, 9L, 5L), (2L, 11L, 5L))
    assert(pairsOf(pts, 10L) === Set((1L, 2L, 4L)))
  }

  test("diagonal-cell pairs are found and each pair emits exactly once") {
    val pts = Seq((1L, 9L, 9L), (2L, 11L, 11L), (3L, 9L, 11L), (4L, 11L, 9L))
    val got = SpatialJoin.proximityPairs(pts.toDF("id", "x", "y"), "id", "x", "y", 10L)
    val rows = got.collect()
    assert(rows.length === rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length)
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      (for { a <- 1 to 4; b <- 1 to 4 if a < b } yield (a.toLong, b.toLong)).toSet)
  }

  test("matches the all-pairs reference on a deterministic irregular cloud") {
    val pts = (0L until 200L).map(i => (i, i * 7919L % 1000L, i * 104729L % 1000L))
    val d = 60L
    val brute = (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts if ia < ib
      ds = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) if ds <= d * d
    } yield (ia, ib, ds)).toSet
    assert(pairsOf(pts, d) === brute)
    assert(brute.nonEmpty, "gate cloud must contain qualifying pairs")
  }

  test("negative coordinates fail fast instead of silently mis-bucketing") {
    val pts = Seq((1L, -5L, 0L), (2L, 3L, 0L))
    val ex = intercept[Exception] {
      SpatialJoin.proximityPairs(pts.toDF("id", "x", "y"), "id", "x", "y", 10L).collect()
    }
    assert(ex.getMessage.contains("SpatialJoin") ||
      ex.getCause != null && ex.getCause.getMessage.contains("SpatialJoin"))
  }

  test("plan has no cartesian product (candidates meet through the cell equi-join)") {
    val pts = (0L until 50L).map(i => (i, i * 31L % 400L, i * 57L % 400L))
    val plan = SpatialJoin.proximityPairs(pts.toDF("id", "x", "y"), "id", "x", "y", 25L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"proximity join must not plan a cartesian:\n$plan")
  }
}
