package graft.operators

import graft.SparkTestBase

/** [[Hits.integerHits]] — integer L∞-normalized hubs/authorities. */
class HitsSpec extends SparkTestBase {
  import spark.implicits._

  private val Scale = 1000000000L

  private def run(edges: Seq[(Long, Long)], iters: Int = 3): Map[Long, (Long, Long)] =
    Hits.integerHits(edges.toDF("src", "dst"), iters, Scale)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("pure star: the center is the sole authority, spokes the (tied-max) hubs") {
    val got = run((1L to 5L).map(s => (s, 99L)))
    assert(got(99L) === (0L, Scale))
    (1L to 5L).foreach(s => assert(got(s) === (Scale, 0L)))
  }

  test("a hub pointing at strong authorities outranks one pointing at weak ones") {
    // auths 10/11 have 3 in-links each, 20 has 1; hub 1 -> {10, 11}, hub 2 -> {20}
    val feeders = (for { a <- Seq(10L, 11L); f <- Seq(3L, 4L, 5L) } yield (f, a))
    val got = run(feeders ++ Seq((1L, 10L), (1L, 11L), (2L, 20L), (6L, 20L)))
    assert(got(1L)._1 > got(2L)._1, s"hub(1)=${got(1L)._1} must exceed hub(2)=${got(2L)._1}")
  }

  test("matches a driver-side integer reference on an irregular graph") {
    val n = 60L
    val edges = (0L until n).flatMap { u =>
      Seq((u, (u * 17 + 5) % n), (u, (u * 29 + 7) % n), (u, u - u % 10))
    }.filter { case (s, d) => s != d }.distinct
    def ref(iters: Int): Map[Long, (Long, Long)] = {
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      var hub = verts.map(_ -> Scale).toMap
      var auth = Map.empty[Long, Long]
      def norm(raw: Map[Long, Long]): Map[Long, Long] = {
        val mx = if (raw.isEmpty) 0L else raw.values.max
        verts.map(v => v -> (if (mx <= 0) 0L
          else (BigInt(raw.getOrElse(v, 0L)) * Scale / mx).toLong)).toMap
      }
      (1 to iters).foreach { _ =>
        auth = norm(edges.groupBy(_._2).map { case (d, es) =>
          d -> es.map(e => hub(e._1)).sum })
        hub = norm(edges.groupBy(_._1).map { case (s, es) =>
          s -> es.map(e => auth(e._2)).sum })
      }
      verts.map(v => v -> (hub(v), auth(v))).toMap
    }
    assert(run(edges, 3) === ref(3))
  }

  test("edgeless input yields an empty result; self-loops are dropped") {
    assert(run(Seq((7L, 7L))) === Map.empty)
  }
}
