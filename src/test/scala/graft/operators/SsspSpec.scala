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

  private def runW(edges: Seq[(Long, Long, Long)], seeds: Seq[Long]): Map[Long, Long] =
    Sssp.weightedSeedDist(edges.toDF("src", "dst", "w"),
        seeds.toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("weighted: a heavy shortcut loses to a longer cheap path") {
    // 0 -10-> 3 direct, but 0-1-2-3 costs 3
    val edges = Seq((0L, 3L, 10L), (0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L))
    assert(runW(edges, Seq(0L)) === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("weighted: undirected closure takes the min weight over both orientations") {
    val edges = Seq((0L, 1L, 5L), (1L, 0L, 2L))
    assert(runW(edges, Seq(0L)) === Map(0L -> 0L, 1L -> 2L))
  }

  test("weighted: matches driver-side Dijkstra on an irregular graph") {
    val n = 40L
    val edges = (0L until n).flatMap { u =>
      Seq((u, (u + 1) % n), (u, (u * 7 + 3) % n), (u, u - u % 10))
    }.filter(e => e._1 != e._2).distinct
      .map { case (s, d) => (s, d, 1L + (s * 7 + d * 13) % 7) }
    val seeds = Seq(0L, 17L)
    // reference: Dijkstra over the undirected min-weight closure
    val und = (edges ++ edges.map(e => (e._2, e._1, e._3)))
      .groupBy(e => (e._1, e._2)).map { case ((s, d), es) => (s, d, es.map(_._3).min) }
    val adj = und.groupBy(_._1).map { case (s, es) => s -> es.map(e => (e._2, e._3)) }
    val distRef = scala.collection.mutable.Map(seeds.map(_ -> 0L): _*)
    val pq = scala.collection.mutable.PriorityQueue(seeds.map(s => (0L, s)): _*)(
      Ordering.by[(Long, Long), Long](-_._1))
    while (pq.nonEmpty) {
      val (d, u) = pq.dequeue()
      if (distRef(u) == d) adj.getOrElse(u, Nil).foreach { case (v, w) =>
        if (distRef.get(v).forall(_ > d + w)) { distRef(v) = d + w; pq.enqueue((d + w, v)) }
      }
    }
    assert(runW(edges, seeds) === distRef.toMap)
  }

  test("weighted: non-positive weight fails fast") {
    val ex = intercept[Exception] {
      runW(Seq((0L, 1L, 0L)), Seq(0L))
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("weightedSeedDist")))
  }

  test("minLabelDepth == nearDupGroups labels + seedDepth from the component minima") {
    // the q203 fusion's exactness claim, on a graph with a shortcut
    // (depth must take it), two components, and an odd cycle
    val g = edges.union(Seq((20L, 21L), (21L, 22L), (22L, 20L)).toDF("src", "dst"))
    CacheScope.scoped {
      val got = Sssp.minLabelDepth(g)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val labels = Dedup.nearDupGroups(
          g.select(col("src").as("id_a"), col("dst").as("id_b")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val depths = Sssp.seedDepth(g,
          labels.values.toSeq.distinct.toDF("id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = labels.keys.toSeq.sorted.map(v => (v, labels(v), depths(v)))
      assert(got == want)
      // spot-pin the semantics: component minima at depth 0, the
      // shortcut path wins (d(0,4) = 2 via 0-5-4, not 4)
      assert(got.contains((0L, 0L, 0L)) && got.contains((4L, 0L, 2L)))
      assert(got.contains((10L, 10L, 0L)) && got.contains((11L, 10L, 1L)))
      assert(got.contains((22L, 20L, 1L)), "odd cycle: both non-min vertices at depth 1")
    }
  }

  test("minLabelDepth fails fast when maxRounds is below the diameter") {
    val chain = (0L until 10L).map(i => (i, i + 1)).toDF("src", "dst")
    val ex = intercept[Exception] {
      CacheScope.scoped { Sssp.minLabelDepth(chain, maxRounds = 3).count() }
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("did not converge")))
  }
}
