package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  /** Build + action inside one CacheScope, then assert the operator's
    * persisted blocks were all released — the block-leak contract every
    * persisting operator must honor. Delta-based (blocks NEW inside the
    * scope), so another suite's session-lifetime blocks can't trip it.
    */
  private def scopedNoLeak[A](body: => A): A = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = graft.operators.CacheScope.scoped(body)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"operator leaked persisted blocks past its CacheScope: $leaked")
    out
  }

  // 0/1 exact dups (differ only in case+spacing), 2/3 near-dups (one word
  // changed), 4 unrelated, 5 short
  lazy val docs = Seq(
    (0L, "The quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the  quick brown fox JUMPS over the lazy dog near the river bank today"),
    (2L, "spark shuffles data between executors during wide transformations like join and group by keys"),
    (3L, "spark shuffles data between executors during wide transformations like join and sort by keys"),
    (4L, "completely different content about cooking pasta with tomato sauce and fresh basil leaves"),
    (5L, "tiny doc")
  ).toDF("doc_id", "text")

  test("exactGroups: case/whitespace-normalized dups collapse to min id") {
    val g = Dedup.exactGroups(docs).orderBy("keep_id").collect()
    assert(g.map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_copies"))).toSeq ==
      Seq((0L, 2L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L)))
  }

  test("ngramJaccardPairs finds exact and near dups, not unrelated") {
    val pairs = scopedNoLeak(Dedup.ngramJaccardPairs(docs, threshold = 0.5).collect())
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // jaccard 1.0
    assert(pairs.contains((2L, 3L))) // one word of ~16 changed
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("ngramJaccardPairs enumerates every pair of a cluster sharing only high-df shingles") {
    // 30 near-identical docs: 11 words, last word unique per doc, so the 9
    // word-3-shingles split into 8 cluster-wide (df = 30) + 1 unique
    // (df = 1); J = 8/10 = 0.8 for every pair — exactly at the threshold.
    // A df-capped candidate generator (cap < 30) would lose ALL of these
    // pairs (every common shingle is above the cap); the prefix filter
    // must enumerate all C(30,2), and the ceil-slack must keep the
    // boundary pairs (t*|d| binary-inexact) in.
    val m = 30
    val cluster = (0 until m).map(i =>
      (i.toLong, s"alpha beta gamma delta epsilon zeta eta theta iota kappa uniq$i"))
    val noise = (100 until 120).map(i =>
      (i.toLong, s"unrelated$i content$i about$i topic$i number$i item$i thing$i"))
    val df = (cluster ++ noise).toDF("doc_id", "text")
    val pairs = scopedNoLeak(Dedup.ngramJaccardPairs(df, threshold = 0.8).collect())
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.length == m * (m - 1) / 2)
    assert(pairs.forall(_._3 == 0.8))
    assert(pairs.forall(p => p._1 < m && p._2 < m))
  }

  test("containmentPairs: a planted excerpt scores C = 1.0 where Jaccard sees nothing") {
    // doc 11 is a verbatim fragment of the much larger doc 10: every
    // shingle of 11 is in 10, but the shared shingles are a small
    // fraction of 10's — J ≈ 8/40 far below threshold, C(11,10) = 1.0
    val big = (0 until 40).map(i => s"w$i").mkString(" ")
    val excerpt = (10 until 20).map(i => s"w$i").mkString(" ")
    val df = Seq((10L, big), (11L, excerpt), (12L, "unrelated stuff about other things entirely")).toDF("doc_id", "text")
    val cont = scopedNoLeak(Dedup.containmentPairs(df, threshold = 0.8).collect())
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(cont == Set((11L, 10L, 1.0)), s"got $cont")
    val jac = scopedNoLeak(Dedup.ngramJaccardPairs(df, threshold = 0.8).collect())
    assert(jac.isEmpty, "Jaccard must NOT pair the excerpt with its container")
  }

  test("containmentPairs == all-pairs brute force (exactness of the asymmetric prefix)") {
    // mixed corpus: exact dups, near dups, an excerpt, noise — every
    // DIRECTED pair the brute-force containment finds must come back
    val base = docs
    val withExcerpt = base.union(Seq(
      (6L, "quick brown fox jumps over the lazy dog"),
      (7L, "executors during wide transformations like join")).toDF("doc_id", "text"))
    val t = 0.7
    val got = scopedNoLeak(Dedup.containmentPairs(withExcerpt, threshold = t)
      .orderBy("id_a", "id_b").collect())
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // brute force on the same shingle definition
    val sh = scopedNoLeak(
      withExcerpt.select(col("doc_id"),
          graft.functions.TextFunctions.shingleSet(col("text"), 3).as("sh"))
        .collect())
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val brute = (for {
      (a, sa) <- sh.toSeq; (b, sb) <- sh.toSeq
      if a != b && sa.nonEmpty
      c = sa.intersect(sb).size.toDouble / sa.size
      if c >= t
    } yield (a, b, math.rint(c * 1e6) / 1e6)).sortBy(p => (p._1, p._2))
    assert(got == brute, s"engine $got vs brute $brute")
    // asymmetry: the excerpt direction is present, the reverse is not
    assert(got.exists(p => p._1 == 6L && p._2 == 0L))
    assert(!got.exists(p => p._1 == 0L && p._2 == 6L))
  }

  test("minhashLshPairs reproduces the exact operator's pairs") {
    val exact = scopedNoLeak(
      Dedup.ngramJaccardPairs(docs, threshold = 0.5).orderBy("id_a", "id_b")
        .collect()).map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val lsh = scopedNoLeak(
      Dedup.minhashLshPairs(docs, threshold = 0.5).orderBy("id_a", "id_b")
        .collect()).map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(lsh == exact)
  }

  test("dedupeAgainst: increment dedupes within itself and against corpus fingerprints") {
    val corpus = Seq(
      (0L, "existing doc about rivers"),
      (1L, "existing doc about mountains")).toDF("doc_id", "text")
    val increment = Seq(
      (10L, "Existing   doc ABOUT rivers"), // dup of corpus 0 after normalization
      (11L, "brand new doc"),
      (12L, "brand  NEW doc"),              // intra-increment dup of 11
      (13L, "another new doc")).toDF("doc_id", "text")
    val kept = Dedup.dedupeAgainst(increment, Dedup.fingerprints(corpus))
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(kept == Seq(11L, 13L))
  }

  test("nearDupGroups: components collapse to min-id reps, chains converge") {
    // components: {0,1}, {2,3}, and the 4-node CHAIN 7-8-9-10 (diameter
    // 3 — exercises multi-round propagation, not just one hop)
    val pairs = Seq((0L, 1L), (2L, 3L), (7L, 8L), (8L, 9L), (9L, 10L))
      .toDF("id_a", "id_b")
    val groups = scopedNoLeak(Dedup.nearDupGroups(pairs).collect())
      .map(r => (r.getAs[Long]("member_id"), r.getAs[Long]("keep_id"))).toMap
    assert(groups == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L,
      7L -> 7L, 8L -> 7L, 9L -> 7L, 10L -> 7L))
  }

  test("nearDupGroups: diameter-50 chain past maxIters converges via " +
      "large-star/small-star fallback") {
    // a 51-node path 0-1-2-...-50 (diameter 50) plus a clique {100,101,102}
    // and a singleton pair {200,201}; maxIters=3 forces propagation to give
    // up and the star contraction to finish — the result must equal both
    // the expected min-labels and what full propagation computes
    val chain = (0L until 50L).map(i => (i, i + 1))
    val rest = Seq((100L, 101L), (100L, 102L), (101L, 102L), (200L, 201L))
    val pairs = (chain ++ rest).toDF("id_a", "id_b")
    val viaFallback = scopedNoLeak(Dedup.nearDupGroups(pairs, maxIters = 3).collect())
      .map(r => (r.getAs[Long]("member_id"), r.getAs[Long]("keep_id"))).toMap
    val expected = ((0L to 50L).map(_ -> 0L) ++
      Seq(100L -> 100L, 101L -> 100L, 102L -> 100L, 200L -> 200L, 201L -> 200L)).toMap
    assert(viaFallback == expected)
    val viaPropagation = scopedNoLeak(Dedup.nearDupGroups(pairs, maxIters = 60).collect())
      .map(r => (r.getAs[Long]("member_id"), r.getAs[Long]("keep_id"))).toMap
    assert(viaPropagation == expected)
  }

  test("nearDupGroups: chain hands off to star contraction EARLY, " +
      "not after burning all of maxIters") {
    // a diameter-50 chain at the DEFAULT maxIters=20: the changed-label
    // count declines arithmetically (one hop per round), so the chain
    // detector (no halving for 3 consecutive rounds) must stop
    // propagation well before round 10 and let star contraction finish —
    // the difference between "has a fallback" and "uses it well"
    val chain = (0L until 50L).map(i => (i, i + 1))
    val pairs = chain.toDF("id_a", "id_b")
    val rounds = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val groups = scopedNoLeak(
      Dedup.nearDupGroups(pairs, maxIters = 20,
          roundProbe = (r, c) => rounds += ((r, c))).collect())
      .map(r => (r.getAs[Long]("member_id"), r.getAs[Long]("keep_id"))).toMap
    assert(rounds.size < 10,
      s"propagation burned ${rounds.size} rounds before handing off: $rounds")
    assert(rounds.last._2 > 0L, "expected a handoff, but propagation converged")
    assert(groups == (0L to 50L).map(_ -> 0L).toMap)
    // and a clique still converges inside the detector window (no handoff)
    val cliqueRounds = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val clique = scopedNoLeak(
      Dedup.nearDupGroups(
          Seq((7L, 8L), (7L, 9L), (8L, 9L)).toDF("id_a", "id_b"),
          roundProbe = (r, c) => cliqueRounds += ((r, c))).collect())
      .map(r => (r.getAs[Long]("member_id"), r.getAs[Long]("keep_id"))).toMap
    assert(cliqueRounds.last._2 == 0L, "clique must converge, not hand off")
    assert(clique == Map(7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("incrementalKeepList == from-scratch components, including an increment " +
      "doc BRIDGING two corpus components") {
    // corpus components: {0,1,2} (star around 0) and {5,6}; corpus pairs
    // also include the redundant (1,2) edge the star drops
    val corpusPairs = Seq((0L, 1L), (0L, 2L), (1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    // increment: 100 pairs into BOTH corpus components (bridge — {0,1,2}
    // and {5,6} must merge under min label 0), 101-102 a new inc-only
    // component, 103 pairs with corpus singleton... 103-7 touches corpus
    // doc 7 never seen in corpus pairs (a pair-free corpus doc)
    val incPairs = Seq((2L, 100L), (5L, 100L), (101L, 102L), (7L, 103L))
      .toDF("id_a", "id_b")
    val corpusKeep = scopedNoLeak(Dedup.nearDupGroups(corpusPairs).collect())
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.toDF("member_id", "keep_id")
    val merged = scopedNoLeak(
      Dedup.incrementalKeepList(corpusKeep, incPairs).collect())
      .map(r => (r.getAs[Long]("member_id"), r.getAs[Long]("keep_id"))).toMap
    val scratch = scopedNoLeak(
      Dedup.nearDupGroups(corpusPairs.unionByName(incPairs)).collect())
      .map(r => (r.getAs[Long]("member_id"), r.getAs[Long]("keep_id"))).toMap
    assert(merged === scratch)
    // the bridge collapsed everything to the global min
    assert(Seq(0L, 1L, 2L, 5L, 6L, 100L).forall(id => merged(id) == 0L))
    assert(merged(101L) == 101L && merged(102L) == 101L)
    assert(merged(7L) == 7L && merged(103L) == 7L)
  }

  test("leakageSafeSplit keeps near-dup groups in ONE split; coverage matches thresholds") {
    // 60 docs in 20 groups of 3 (ids 3k, 3k+1, 3k+2 share a group)
    val groups = (0 until 60).map(i => (i.toLong, (i / 3 * 3).toLong))
      .toDF("member_id", "keep_id")
    val docs = (0 until 60).map(_.toLong).toDF("doc_id")
    val rows = Dedup.leakageSafeSplit(docs, groups).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("keep_id"), r.getAs[String]("split")))
    // every member of a group lands in the same split
    rows.groupBy(_._2).foreach { case (k, members) =>
      assert(members.map(_._3).distinct.length == 1, s"group $k straddles splits")
    }
    assert(rows.map(_._3).toSet.subsetOf(Set("train", "valid", "test")))
    // docs absent from the group list keep themselves
    val solo = Dedup.leakageSafeSplit(
      Seq(99L).toDF("doc_id"), spark.emptyDataFrame.selectExpr("1L as member_id", "1L as keep_id").limit(0))
      .head()
    assert(solo.getAs[Long]("keep_id") == 99L)
  }

  test("simhashPairs: near-identical docs collide within small hamming") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) || pairs.contains((2L, 3L)))
  }

  test("embedding near-dup: exact finds planted duplicate vector") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f, 0.0f)), // cos ~0.995 with 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupExact(vecs, threshold = 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((0L, 1L)))
    // LSH variant must also find it (identical-direction vectors share buckets)
    val lsh = Dedup.embeddingNearDupLsh(vecs, threshold = 0.95, dim = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(lsh == Seq((0L, 1L)))
  }
}
