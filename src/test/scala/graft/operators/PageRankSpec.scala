package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  private val Scale = 1000000000000L

  /** In-memory reference of the exact integer recurrence — the spec's
    * ground truth for arbitrary graphs.
    */
  private def reference(
      edges: Seq[(Long, Long)], iters: Int,
      scale: Long = Scale, aNum: Long = 85, aDen: Long = 100): Map[Long, Long] = {
    val e = edges.distinct
    val verts = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val n = verts.size.toLong
    val init = scale / n
    val teleport = (init * (aDen - aNum)) / aDen
    val outdeg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var pr = verts.map(_ -> init).toMap
    (0 until iters).foreach { _ =>
      val in = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => pr(s) / outdeg(s) }.sum
      }
      pr = verts.map(v => v -> (teleport + (aNum * in.getOrElse(v, 0L)) / aDen)).toMap
    }
    pr
  }

  private def run(edges: Seq[(Long, Long)], iters: Int, parts: Int = 4): Map[Long, Long] =
    CacheScope.scoped {
      PageRank.integerPageRank(
          edges.toDF("src", "dst").repartition(parts), iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }

  test("matches the integer reference on a mixed graph (hub + chain + dangling)") {
    // hub 0 <-> leaves 1..5, a chain 6->7->8, 8 dangling (no out-edges),
    // and 9 only as a source (appears as vertex via src side)
    val edges = (1L to 5L).flatMap(l => Seq((l, 0L), (0L, l))) ++
      Seq((6L, 7L), (7L, 8L), (9L, 0L))
    assert(run(edges, 6) == reference(edges, 6))
  }

  test("cycle symmetry: equal ranks on a directed cycle") {
    val n = 12L
    val edges = (0L until n).map(v => (v, (v + 1) % n))
    val got = run(edges, 8)
    assert(got.values.toSet.size == 1, s"cycle ranks diverged: $got")
    assert(got == reference(edges, 8))
  }

  test("hub outranks leaves and ranking is deterministic across partitionings") {
    val edges = (1L to 40L).map(l => (l, 0L)) ++ (1L to 40L).map(l => (0L, l)) ++
      (1L to 40L).map(l => (l, l % 40 + 1))
    val a = run(edges, 5, parts = 1)
    val b = run(edges, 5, parts = 16)
    assert(a == b, "partitioning changed the exact integer ranks")
    assert(a == reference(edges, 5))
    assert(a(0L) > a(7L), "hub must outrank a leaf")
  }

  test("iters = 0 returns the uniform init; empty edges yield an empty frame") {
    val edges = Seq((1L, 2L), (2L, 3L))
    val got = run(edges, 0)
    assert(got == Map(1L -> Scale / 3, 2L -> Scale / 3, 3L -> Scale / 3))
    val empty = CacheScope.scoped {
      PageRank.integerPageRank(
        Seq.empty[(Long, Long)].toDF("src", "dst"), 3)
    }
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("id", "pr"))
  }

  test("matches the reference on the q120 synthesis shape at 5k vertices") {
    // the gate query's own edge rules (two multiplicative-hash links +
    // block hub), at a scale where partitioning and merge order would
    // surface any non-determinism in the integer recurrence
    val m = 5000L
    val edges = (0L until m).flatMap { id =>
      Seq((id * 7 + 3) % m, (id * 13 + 11) % m, id - id % 50)
        .filter(_ != id).map(dst => (id, dst))
    }
    assert(run(edges, 6, parts = 32) == reference(edges, 6))
  }

  test("duplicate edges collapse (multigraph input does not double-count)") {
    val once = run(Seq((1L, 2L), (2L, 1L)), 4)
    val dup = run(Seq((1L, 2L), (1L, 2L), (2L, 1L), (2L, 1L), (1L, 2L)), 4)
    assert(once == dup)
  }

  /** In-memory reference of the PERSONALIZED recurrence (q158). */
  private def referencePpr(
      edges: Seq[(Long, Long)], seeds: Set[Long], iters: Int,
      scale: Long = Scale, aNum: Long = 85, aDen: Long = 100): Map[Long, Long] = {
    val e = edges.distinct
    val verts = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val s = seeds.intersect(verts.toSet)
    val init = scale / s.size
    val teleport = (init * (aDen - aNum)) / aDen
    val outdeg = e.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    var pr = verts.map(v => v -> (if (s(v)) init else 0L)).toMap
    (0 until iters).foreach { _ =>
      val in = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (u, _) => pr(u) / outdeg(u) }.sum
      }
      pr = verts.map(v =>
        v -> ((if (s(v)) teleport else 0L) + (aNum * in.getOrElse(v, 0L)) / aDen)).toMap
    }
    pr
  }

  private def runPpr(edges: Seq[(Long, Long)], seeds: Seq[Long], iters: Int): Map[Long, Long] =
    CacheScope.scoped {
      PageRank.integerPersonalizedPageRank(
          edges.toDF("src", "dst").repartition(4), seeds.toDF("id"), iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }

  test("personalized: matches the seed-teleport reference; rank decays with distance") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 0L), (0L, 2L))
    val got = runPpr(edges, Seq(0L), 5)
    assert(got == referencePpr(edges, Set(0L), 5))
    // rank is seed-proximity-biased: the seed outranks everything,
    // its direct successors outrank the far side of the cycle
    assert(got(0L) > got(1L) && got(1L) > got(3L))
  }

  test("personalized: off-graph seeds are ignored, mass splits across present ones") {
    val edges = Seq((1L, 2L), (2L, 1L))
    assert(runPpr(edges, Seq(1L, 99L), 3) == referencePpr(edges, Set(1L), 3))
  }
}
