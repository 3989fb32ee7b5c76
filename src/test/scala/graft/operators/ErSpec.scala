package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Er.editDistancePairs]] — FastSS d=1 blocking + exact verify. */
class ErSpec extends SparkTestBase {
  import spark.implicits._

  private def pairsOf(rows: Seq[(Long, String)]): Set[(Long, Long, Long)] =
    Er.editDistancePairs(rows.toDF("id", "name"), "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("substitution, insertion, deletion, and identical keys all pair at d<=1") {
    val got = pairsOf(Seq(
      1L -> "kitten", 2L -> "mitten", // substitution
      3L -> "kittens", // insertion vs 1
      4L -> "kitte", // deletion vs 1
      5L -> "kitten", // identical to 1 -> dist 0
      6L -> "unrelated"))
    assert(got.contains((1L, 2L, 1L)))
    assert(got.contains((1L, 3L, 1L)))
    assert(got.contains((1L, 4L, 1L)))
    assert(got.contains((1L, 5L, 0L)))
    assert(!got.exists(p => p._1 == 6L || p._2 == 6L))
    // transposition is distance 2 in plain levenshtein: 2-3, 2-4 etc.
    // may or may not share signatures, but must never pass the verify
    assert(got.forall(_._3 <= 1))
  }

  test("shared-signature false positives are verified away (ab/ba is distance 2)") {
    // delete pos 0 of "ab" = "b"; delete pos 1 of "ba" = "b" -> candidates
    val got = pairsOf(Seq(1L -> "ab", 2L -> "ba"))
    assert(got.isEmpty)
  }

  test("blocking equals brute force on a deterministic dirty-name corpus") {
    val base = (0 until 80).map(i => f"Entity#$i%04d")
    val dirty = base.zipWithIndex.collect { case (s, i) if i % 3 == 0 =>
      s.updated(i % s.length, 'X') // one substitution
    }
    val all = (base ++ dirty).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val got = pairsOf(all)
    val brute = (for {
      (ia, sa) <- all; (ib, sb) <- all if ia < ib
      d = {
        // classic Levenshtein DP
        val dp = Array.tabulate(sa.length + 1, sb.length + 1) { (x, y) =>
          if (x == 0) y else if (y == 0) x else 0
        }
        for (x <- 1 to sa.length; y <- 1 to sb.length)
          dp(x)(y) = math.min(math.min(dp(x - 1)(y) + 1, dp(x)(y - 1) + 1),
            dp(x - 1)(y - 1) + (if (sa(x - 1) == sb(y - 1)) 0 else 1))
        dp(sa.length)(sb.length)
      } if d <= 1
    } yield (ia, ib, d.toLong)).toSet
    assert(got === brute)
    assert(brute.nonEmpty, "the planted corpus must actually produce pairs")
  }

  test("null keys and over-length keys are excluded, not crashed on") {
    val rows = Seq((1L, "short"), (2L, null.asInstanceOf[String]),
      (3L, "x" * (Er.maxKeyChars + 1)), (4L, "short"))
    val got = pairsOf(rows)
    assert(got === Set((1L, 4L, 0L)))
  }
}
