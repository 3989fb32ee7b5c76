package graft.operators



import graft.SparkTestBase

/** [[Triangles.vertexTriangles]] — compact-forward exact counts. */
class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  private def countsOf(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    Triangles.vertexTriangles(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("K4: every vertex has degree 3 and sits in 3 triangles") {
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val got = countsOf(k4)
    assert(got === (0L to 3L).map(v => v -> (3L, 3L)).toMap)
  }

  test("triangle with a pendant: the pendant counts zero") {
    val got = countsOf(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)))
    assert(got === Map(1L -> (3L, 1L), 2L -> (2L, 1L), 3L -> (2L, 1L), 4L -> (1L, 0L)))
  }

  test("star hub: high degree, zero triangles (orientation keeps the hub fan-out empty)") {
    val star = (1L to 40L).map(v => (0L, v))
    val got = countsOf(star)
    assert(got(0L) === (40L, 0L))
    assert((1L to 40L).forall(v => got(v) === (1L, 0L)))
  }

  test("symmetrization: duplicate and reversed input edges do not double-count") {
    val tri = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L), (1L, 3L), (1L, 2L))
    val got = countsOf(tri)
    assert(got === Map(1L -> (2L, 1L), 2L -> (2L, 1L), 3L -> (2L, 1L)))
  }

  test("matches brute force on a deterministic irregular graph") {
    val n = 40
    // chain + 8-block hub (guaranteed {u, u+1, hub} triangles) + an
    // irregular multiplicative-hash tail — the q138 gate's shape
    val edges = (for {
      u <- 0 until n
      v <- Seq(u + 1, u - u % 8, (u * 7 + 5) % n) if u != v && v < n
    } yield (u.toLong, v.toLong))
    val got = countsOf(edges)
    // brute force over the undirected adjacency
    val adj = Array.fill(n, n)(false)
    edges.foreach { case (a, b) =>
      adj(a.toInt)(b.toInt) = true; adj(b.toInt)(a.toInt) = true
    }
    for (v <- 0 until n) {
      val deg = (0 until n).count(adj(v))
      var tri = 0L
      for (a <- 0 until n if adj(v)(a); b <- a + 1 until n if adj(v)(b) && adj(a)(b))
        tri += 1
      if (deg > 0) assert(got(v.toLong) === (deg.toLong, tri),
        s"vertex $v: got ${got(v.toLong)}, want ($deg, $tri)")
    }
    assert(got.values.map(_._2).sum > 0, "the planted graph must have triangles")
  }

  test("out-of-range vertex id fails fast instead of silently dropping") {
    val bad = Seq((1L, 1L << 33), (1L, 2L))
    // raise_error surfaces as SparkRuntimeException (USER_RAISED) or
    // wrapped in SparkException depending on where the task fails
    val e = intercept[Exception] {
      Triangles.vertexTriangles(bad.toDF("src", "dst")).collect()
    }
    def mentions(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("Triangles")) ||
        mentions(t.getCause))
    assert(mentions(e), s"unexpected error: $e")
  }
}
