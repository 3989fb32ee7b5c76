package graft.operators

import graft.SparkTestBase

/** [[SeqPatterns.frequentSequences]] — GSP-style gapped subsequence
  * mining via the greedy occurrence bounds. The spec's core claim is
  * EXACTNESS of the greedy algebra: a user contains (a,b,c) as a
  * (non-contiguous) subsequence iff last(c) > e2(a,b) where e2 is the
  * earliest b strictly after the first a — any witness i<j<k implies
  * first(a) <= i, hence e2 <= j < k <= last(c), and conversely the
  * bound positions are themselves a witness. We assert it against a
  * brute-force subsequence-containment reference on irregular streams.
  */
class SeqPatternsSpec extends SparkTestBase {
  import spark.implicits._

  /** Brute-force: support = #users whose ordered type stream contains
    * the pattern as a subsequence; frequent = support >= ceil(n*pct/100).
    */
  private def ref(streams: Map[String, Seq[String]], pct: Int): Map[(String, String, String), Long] = {
    val users = streams.keys.toSeq
    val th = (users.size * pct + 99) / 100
    def contains(ts: Seq[String], pat: Seq[String]): Boolean = {
      var i = 0
      ts.foreach { t => if (i < pat.size && t == pat(i)) i += 1 }
      i == pat.size
    }
    val alphabet = streams.values.flatten.toSeq.distinct
    val pats2 = for (a <- alphabet; b <- alphabet) yield Seq(a, b)
    val pats3 = for (a <- alphabet; b <- alphabet; c <- alphabet) yield Seq(a, b, c)
    (pats2 ++ pats3).flatMap { p =>
      val s = users.count(u => contains(streams(u), p)).toLong
      if (s >= th) Some(((p(0), p(1), if (p.size == 3) p(2) else ""), s)) else None
    }.toMap
  }

  /** Run the operator on per-user streams; position i becomes ts=i with
    * a unique event_id tiebreak.
    */
  private def run(streams: Map[String, Seq[String]], pct: Int): Map[(String, String, String), Long] = {
    val rows = streams.toSeq.flatMap { case (u, ts) =>
      ts.zipWithIndex.map { case (t, i) =>
        (u, t, new java.sql.Timestamp(i * 1000L), s"$u-$i")
      }
    }
    val df = rows.toDF("user_id", "event_type", "ts", "event_id")
    SeqPatterns.frequentSequences(df, "user_id", "event_type", "ts", "event_id", pct)
      .collect().map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        r.getLong(3))).toMap
  }

  test("witness algebra: (a,b,c) held exactly when a gapped witness i<j<k exists") {
    // u1: a..b..c with gaps (contained); u2: c b a — reversed, no pair
    // in order except what the reversal gives; u3: a c b — has (a,c),
    // (a,b), (c,b) but NOT (a,b,c)
    val streams = Map(
      "u1" -> Seq("a", "x", "b", "x", "c"),
      "u2" -> Seq("c", "b", "a"),
      "u3" -> Seq("a", "c", "b"))
    val got = run(streams, 30) // th = ceil(3*30/100) = 1
    assert(got === ref(streams, 30))
    assert(got(("a", "b", "c")) === 1L) // only u1
    assert(!got.contains(("b", "a", "c")))
  }

  test("duplicate types: repeated symbols serve as both ends (aa, aba, aab)") {
    val streams = Map(
      "u1" -> Seq("a", "a"),          // contains (a,a) but no triple
      "u2" -> Seq("a", "b", "a"),     // (a,b),(b,a),(a,a),(a,b,a)
      "u3" -> Seq("a", "a", "b"))     // (a,a),(a,b),(a,a,b)
    val got = run(streams, 30) // th = 1
    assert(got === ref(streams, 30))
    assert(got(("a", "a", "")) === 3L)
    assert(got(("a", "b", "a")) === 1L)
    assert(got(("a", "a", "b")) === 1L)
    assert(!got.contains(("a", "a", "a")))
  }

  test("ties on ts resolve by the tiebreak column, giving one total order") {
    // both events at the same timestamp: order decided by event_id
    // ("u1-0" < "u1-1"), so the stream is (a, b) and (b, a) is absent
    val df = Seq(
      ("u1", "a", new java.sql.Timestamp(0L), "u1-0"),
      ("u1", "b", new java.sql.Timestamp(0L), "u1-1"))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = SeqPatterns.frequentSequences(df, "user_id", "event_type",
        "ts", "event_id", 50)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(("a", "b", "")))
  }

  test("a-priori prune never drops a frequent triple (threshold-straddling prefix)") {
    // (a,b,c) support 2 of 4 users = 50%; at pct=50 the prefix (a,b)
    // has support exactly 2 — right AT the threshold, so the prune must
    // keep it (support(a,b) >= support(a,b,c) always; the semi-join
    // gate must use >=, not >)
    val streams = Map(
      "u1" -> Seq("a", "b", "c"),
      "u2" -> Seq("a", "b", "c"),
      "u3" -> Seq("b", "c", "a"),
      "u4" -> Seq("c", "b", "a"))
    val got = run(streams, 50) // th = 2
    assert(got === ref(streams, 50))
    assert(got(("a", "b", "c")) === 2L)
  }

  test("matches brute force on irregular pseudo-random streams") {
    val alphabet = Vector("s", "v", "p", "e", "r")
    val streams = (0 until 24).map { u =>
      val len = 1 + (u * 7) % 9
      val seq = (0 until len).map(i => alphabet((u * 13 + i * 5 + i * i) % 5))
      s"u$u" -> seq
    }.toMap
    for (pct <- Seq(5, 20, 45)) {
      assert(run(streams, pct) === ref(streams, pct), s"mismatch at pct=$pct")
    }
  }
}
