package graft.operators

import graft.SparkTestBase

/** [[Apriori.frequentTriples]] — pruned enumeration is exact. */
class AprioriSpec extends SparkTestBase {
  import spark.implicits._

  private def triples(rows: Seq[(Long, Long)], minSup: Long): Map[(Long, Long, Long), Long] =
    Apriori.frequentTriples(rows.toDF("ok", "pk"), "ok", "pk", minSup)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap

  test("planted frequent triple surfaces with exact support; one-off triples don't") {
    val rows = Seq(
      // {1,2,3} in baskets 10, 11, 12; {1,2,9} only in basket 13
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L), (11L, 3L), (11L, 7L),
      (12L, 1L), (12L, 2L), (12L, 3L),
      (13L, 1L), (13L, 2L), (13L, 9L))
    val got = triples(rows, 2L)
    assert(got((1L, 2L, 3L)) === 3L)
    assert(!got.contains((1L, 2L, 9L)))
  }

  test("duplicate (basket, item) rows collapse before counting") {
    val rows = Seq((1L, 5L), (1L, 5L), (1L, 6L), (1L, 7L),
      (2L, 5L), (2L, 6L), (2L, 7L), (2L, 7L))
    assert(triples(rows, 2L) === Map((5L, 6L, 7L) -> 2L))
  }

  test("matches the unpruned brute force on an irregular deterministic basket set") {
    val rows = for {
      b <- 0L until 80L
      i <- 0L until (3 + b % 4)
    } yield (b, (b * (i + 7) + i * i * 11) % 23)
    val dist = rows.distinct
    val brute = (for {
      (b, items) <- dist.groupBy(_._1).toSeq
      is = items.map(_._2).distinct.sorted
      a <- is; x <- is if x > a; c <- is if c > x
    } yield (a, x, c)).groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2L).toMap
    assert(triples(rows, 2L) === brute)
    assert(brute.nonEmpty, "gate baskets must contain frequent triples")
  }

  test("support floor above the max co-occurrence yields empty") {
    val rows = Seq((1L, 1L), (1L, 2L), (1L, 3L))
    assert(triples(rows, 2L) === Map.empty)
  }
}
