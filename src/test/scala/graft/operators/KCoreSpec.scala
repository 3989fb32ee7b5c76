package graft.operators

import graft.SparkTestBase

/** [[KCore.kCore]] — synchronous peel to the exact k-core. */
class KCoreSpec extends SparkTestBase {
  import spark.implicits._

  private def coreOf(edges: Seq[(Long, Long)], k: Int,
      probe: (Int, Long) => Unit = (_, _) => ()): Map[Long, Long] =
    CacheScope.scoped {
      KCore.kCore(edges.toDF("src", "dst"), k, roundProbe = probe)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }

  test("K5 clique with pendant chain: the clique is the 4-core, the chain peels") {
    val clique = for (a <- 0L to 4L; b <- 0L to 4L if a < b) yield (a, b)
    val chain = Seq((4L, 5L), (5L, 6L), (6L, 7L))
    val got = coreOf(clique ++ chain, k = 4)
    assert(got === (0L to 4L).map(_ -> 4L).toMap)
  }

  test("k above the densest structure yields the empty core") {
    val clique = for (a <- 0L to 4L; b <- 0L to 4L if a < b) yield (a, b)
    assert(coreOf(clique, k = 5) === Map.empty)
  }

  test("a long chain cascades one peel round per hop (the multi-round path)") {
    // a 2-core query on a pure path peels ONLY the two endpoints each
    // round — the cascade the synchronous batching cannot shortcut
    val n = 16L
    val path = (0L until n - 1).map(v => (v, v + 1))
    var rounds = 0
    val got = coreOf(path, k = 2, probe = (r, _) => rounds = r + 1)
    assert(got === Map.empty)
    // n/2 peel rounds to empty, plus the confirming no-change round
    assert(rounds >= n / 2, s"expected a >=${n / 2}-round cascade, got $rounds")
  }

  test("cycle plus chain: the cycle is the 2-core and survives the cascade") {
    val cycle = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    val chain = (3L until 12L).map(v => (v, v + 1))
    val got = coreOf(cycle ++ chain, k = 2)
    assert(got === Map(0L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("core degrees are within-core, not original degrees") {
    // clique 0-3 (3-regular) + vertex 4 attached to 0 and 1: at k=3 the
    // core is the clique, and 0/1 report degree 3, not 4
    val clique = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val got = coreOf(clique ++ Seq((0L, 4L), (1L, 4L)), k = 3)
    assert(got === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("duplicate and reversed input edges do not inflate degrees") {
    val tri = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L), (1L, 3L))
    assert(coreOf(tri, k = 2) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(coreOf(tri, k = 3) === Map.empty)
  }
}
