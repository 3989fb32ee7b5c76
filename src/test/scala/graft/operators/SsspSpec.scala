package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Multi-source BFS seed depth (q154): exact hop distances on a planted
  * path + shortcut graph, nearest-seed semantics, unreachable vertices
  * absent, and the one-scalar-per-round probe discipline.
  */
class SsspSpec extends SparkTestBase {
  import spark.implicits._

  // path 0-1-2-3-4-5-6, shortcut 0-5, isolated pair 10-11
  private lazy val edges = Seq(
    (0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
    (0L, 5L), (10L, 11L)
  ).toDF("src", "dst")

  private def run(seedIds: Seq[Long], probe: (Int, Long) => Unit = (_, _) => ()) =
    CacheScope.scoped {
      Sssp.seedDepth(edges, seedIds.toDF("id"), roundProbe = probe)
        .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }

  test("single source: shortcut beats the path") {
    assert(run(Seq(0L)) == Seq(
      0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 2L, 5L -> 1L, 6L -> 2L))
  }

  test("multi-source takes the nearest seed; unreachable stay absent") {
    val out = run(Seq(0L, 6L))
    assert(out == Seq(
      0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 2L, 5L -> 1L, 6L -> 0L))
    assert(!out.exists(p => p._1 == 10L || p._1 == 11L))
  }

  test("seeds in a separate component reach only it") {
    assert(run(Seq(10L)) == Seq(10L -> 0L, 11L -> 1L))
  }

  test("rounds = eccentricity + 1, frontier counts strictly positive then 0") {
    val counts = scala.collection.mutable.ArrayBuffer[Long]()
    run(Seq(0L), (_, n) => counts += n)
    // depths from 0: frontier sizes 2 (1,5), 3 (2,4,6), 1 (3), then 0
    assert(counts.toSeq == Seq(2L, 3L, 1L, 0L))
  }
}
