package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Cross-set fuzzy decontamination (q148): planted leaks are found,
  * within-set near-dups are structurally absent, and scores equal the
  * symmetric operator's on the same pair.
  */
class DecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  private def sentence(seed: Int, n: Int): String =
    (0 until n).map(i => s"w${(seed * 31 + i * 7) % 97}").mkString(" ")

  // train: 20 docs; eval: doc 5's text minus first token (a leak) and
  // one unrelated probe; train also carries an INTERNAL near-dup pair
  // (docs 11 and 12 share text) which must NOT appear cross-set
  private lazy val train = (0 until 20)
    .map(i => (i.toLong, sentence(if (i == 12) 11 else i, 30)))
    .toDF("doc_id", "text")
  private lazy val evals = Seq(
    (1000005L, sentence(5, 30).split(" ").drop(1).mkString(" ")),
    // probe tokens live in a disjoint namespace (the seeded sentences
    // all walk the same step-7 cycle mod 97, so an unrelated SEED can
    // still alias a train window — u-tokens cannot)
    (1000099L, (0 until 30).map(i => s"u$i").mkString(" "))
  ).toDF("doc_id", "text")

  private lazy val out = CacheScope.scoped {
    Dedup.minhashLshCrossPairs(evals, train, threshold = 0.8)
      .orderBy("id_a", "id_b").collect()
  }

  test("the planted leak is found with the exact (S-1)/S score") {
    val leak = out.filter(r => r.getLong(0) == 1000005L && r.getLong(1) == 5L)
    assert(leak.length == 1)
    // 30 tokens -> 28 shingles, drop-first removes exactly the leading one
    assert(leak(0).getDouble(2) == math.rint(27.0 / 28.0 * 1e6) / 1e6)
  }

  test("output pairs are eval x train only — no within-set pairs") {
    assert(out.forall(r => r.getLong(0) >= 1000000L && r.getLong(1) < 1000000L))
    // the train-internal 11/12 duplicate never surfaces
    assert(!out.exists(r => r.getLong(1) == 11L && r.getLong(0) == 12L))
  }

  test("the unrelated probe matches nothing") {
    assert(!out.exists(_.getLong(0) == 1000099L))
  }
}
