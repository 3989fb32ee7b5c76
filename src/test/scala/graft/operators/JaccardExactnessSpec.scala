package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** EXACTNESS property of the prefix-filtered Jaccard join: on
  * ScalaCheck-generated corpora of synthetic near-dup clusters,
  * [[Dedup.ngramJaccardPairs]] must equal an in-JVM brute-force
  * all-pairs Jaccard — same pairs, same scores. This is the operator's
  * core claim (candidates from the df-ranked prefix join are a SUPERSET
  * of all qualifying pairs, with no document-frequency cap), and it
  * guards the 1e-9 ceil-slack boundary (`t·|d|` is binary-inexact for
  * most t: ceil must not round 4.0000000000000002 up to 5 and shorten a
  * prefix) — the generators deliberately produce doc sizes where t·|d|
  * lands on/near integers, and clusters whose pairwise similarity sits
  * exactly AT the threshold.
  */
class JaccardExactnessSpec extends SparkTestBase {
  import spark.implicits._

  private val n = 3 // shingle width

  // --- brute-force twin of the engine's normalization + Jaccard ---

  private def shingles(text: String): Set[String] = {
    val norm = text.trim.toLowerCase.replaceAll("\\s+", " ")
    val toks = norm.split(" ", -1) // split("", " ") keeps the empty token, like Spark's split
    toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
  }

  private def brute(docs: Seq[(Long, String)], t: Double): Map[(Long, Long), Double] = {
    val sets = docs.map { case (id, txt) => id -> shingles(txt) }.toMap
    (for {
      Seq((a, _), (b, _)) <- docs.combinations(2).map(_.sortBy(_._1)).toSeq
      sa = sets(a); sb = sets(b)
      if sa.nonEmpty && sb.nonEmpty
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= t
    } yield (a, b) -> j).toMap
  }

  private def engine(docs: Seq[(Long, String)], t: Double): Map[(Long, Long), Double] =
    CacheScope.scoped {
      Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"), threshold = t).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    }

  private def assertExact(docs: Seq[(Long, String)], t: Double): Unit = {
    val expect = brute(docs, t)
    val got = engine(docs, t)
    assert(got.keySet == expect.keySet,
      s"t=$t: missing=${(expect.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- expect.keySet).take(5)}")
    expect.foreach { case (k, j) =>
      assert(math.abs(got(k) - j) <= 5e-7, s"t=$t pair $k: got ${got(k)}, expected $j")
    }
  }

  // --- generators: clusters of mutated copies + unrelated noise ---

  private val vocab: Vector[String] =
    (0 until 60).map(i => s"w$i").toVector

  /** One cluster: a base doc of `len` vocab tokens and `m` members, each
    * the base with 0-2 token substitutions (plus a member-unique tail
    * token on some) — pairwise similarities land above, below, and AT
    * typical thresholds depending on len.
    */
  private def clusterGen(idBase: Long): Gen[Seq[(Long, String)]] = for {
    len <- Gen.choose(n, 30) // includes tiny docs: boundary t*|d| cases
    m <- Gen.choose(2, 8)
    base <- Gen.listOfN(len, Gen.oneOf(vocab))
    muts <- Gen.listOfN(m, for {
      nMut <- Gen.frequency(3 -> 0, 3 -> 1, 2 -> 2)
      positions <- Gen.listOfN(nMut, Gen.choose(0, len - 1))
      words <- Gen.listOfN(nMut, Gen.oneOf(vocab))
      tail <- Gen.oneOf(true, false)
    } yield (positions.zip(words), tail))
  } yield muts.zipWithIndex.map { case ((subs, tail), i) =>
    val toks = subs.foldLeft(base.toVector) { case (v, (p, w)) => v.updated(p, w) }
    val withTail = if (tail) toks :+ s"uniq${idBase + i}" else toks
    (idBase + i, withTail.mkString(" "))
  }

  private def corpusGen: Gen[Seq[(Long, String)]] = for {
    nClusters <- Gen.choose(4, 8)
    clusters <- Gen.sequence[Seq[Seq[(Long, String)]], Seq[(Long, String)]](
      (0 until nClusters).map(c => clusterGen(c * 100L)))
    noise <- Gen.listOfN(15, Gen.listOfN(12, Gen.oneOf(vocab)))
  } yield clusters.flatten ++ noise.zipWithIndex.map { case (toks, i) =>
    (10000L + i, toks.mkString(" "))
  }

  test("generated near-dup corpora: engine == brute force at t = 0.8 and 0.5") {
    Seq(11L, 29L, 43L).foreach { seed =>
      val docs = corpusGen(Gen.Parameters.default, Seed(seed)).get
      assertExact(docs, 0.8)
      assertExact(docs, 0.5)
    }
  }

  test("threshold-boundary cluster: every pair exactly AT t survives the ceil slack") {
    // |shingles| = 10 per doc, 8 shared + 2 member-specific: J = 8/12 for
    // every cross pair = 2/3 — run at t = 2/3 where t*|d| = 6.666..7 and
    // t's binary representation is inexact in the worst way
    val m = 12
    val base = (0 until 9).map(i => s"s$i") // 9 tokens -> 7 shingles shared
    val docs = (0 until m).map { i =>
      (i.toLong, (Seq(s"head$i") ++ base ++ Seq(s"tail$i")).mkString(" "))
    }
    assertExact(docs, 2.0 / 3.0)
  }

  test(">1000-member near-identical cluster keeps ALL its pairs (round-2 failure mode)") {
    // 1100 docs sharing an 11-token base, unique last token: 9 shingles,
    // 8 cluster-wide (df = 1100) + 1 unique; J = 8/10 = 0.8 for every
    // pair. A df-capped candidate generator loses every pair (all common
    // shingles are hotter than any cap); the prefix filter must keep all
    // C(1100,2), scored exactly 0.8, at the inexact boundary t*9 = 7.2.
    val m = 1100
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = (0 until m).map(i => (i.toLong, s"$base uniq$i"))
    val agg = CacheScope.scoped {
      Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"), threshold = 0.8)
        .agg(count(lit(1)), min("jaccard"), max("jaccard"), max("id_b"))
        .head()
    }
    assert(agg.getLong(0) == m.toLong * (m - 1) / 2, s"pair count ${agg.getLong(0)}")
    assert(agg.getDouble(1) == 0.8 && agg.getDouble(2) == 0.8)
    assert(agg.getLong(3) == m - 1L)
  }
}
