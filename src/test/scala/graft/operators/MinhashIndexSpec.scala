package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MinhashIndexSpec extends SparkTestBase {
  import spark.implicits._

  /** Delta-based, not global-emptiness: the shared test session may carry
    * another suite's blocks — only blocks NEW inside the scope count as
    * leaks.
    */
  private def scopedNoLeak[A](body: => A): A = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = CacheScope.scoped(body)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"operator leaked persisted blocks past its CacheScope: $leaked")
    out
  }

  // corpus: an internal near-dup pair (0,1) that must NOT surface on the
  // incremental path, plus singles; increment: a near-dup of corpus 2
  // (cross pair), an intra-increment near-dup pair, and an unrelated doc
  private lazy val corpus = Seq(
    (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa first"),
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa second"),
    (2L, "spark shuffles data between executors during wide transformations like join and group by keys"),
    (3L, "completely different content about cooking pasta with tomato sauce and fresh basil leaves")
  ).toDF("doc_id", "text")

  private lazy val increment = Seq(
    (10L, "spark shuffles data between executors during wide transformations like join and sort by keys"),
    (11L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (12L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
    (13L, "totally unrelated increment document about gardening tulips in spring soil")
  ).toDF("doc_id", "text")

  private def buildIndex(docs: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_mh_index").toString
    Dedup.writeMinhashIndex(docs, dir)
    dir
  }

  test("incremental pairs == full-run pairs restricted to those touching the increment") {
    val dir = buildIndex(corpus)
    val inc = scopedNoLeak(
      Dedup.incrementalNearDupPairs(spark, dir, increment, threshold = 0.5)
        .orderBy("id_a", "id_b").collect())
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val full = scopedNoLeak(
      Dedup.minhashLshPairs(corpus.union(increment), threshold = 0.5)
        .orderBy("id_a", "id_b").collect())
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      .filter(p => p._1 >= 10L || p._2 >= 10L)
    assert(inc == full, s"incremental $inc vs full-restricted $full")
    // shape sanity: cross pair, intra-increment pair, no corpus-corpus pair
    val ids = inc.map(p => (p._1, p._2)).toSet
    assert(ids.contains((2L, 10L)))
    assert(ids.contains((11L, 12L)))
    assert(!ids.contains((0L, 1L)), "corpus-vs-corpus pair leaked into the incremental output")
  }

  test("the incremental path reads ONLY the index — never the corpus text") {
    // corpus lives in a parquet file of its own; the index is built from
    // it, then the search frame's inputFiles must all sit under the index
    // directory (the increment here is an in-memory relation)
    val corpusDir = java.nio.file.Files.createTempDirectory("graft_mh_corpus").toString + "/docs"
    corpus.write.parquet(corpusDir)
    val dir = buildIndex(spark.read.parquet(corpusDir))
    val frame = Dedup.incrementalNearDupPairs(spark, dir, increment, threshold = 0.5)
    val files = frame.inputFiles
    assert(files.nonEmpty)
    assert(files.forall(_.contains(dir.substring(dir.lastIndexOf('/') + 1))),
      s"search plan reads outside the index: ${files.filterNot(_.contains(dir)).take(3).toSeq}")
    assert(!files.exists(_.contains("graft_mh_corpus")),
      "search plan reads the corpus documents themselves")
    // and structurally: the index stores no text column at all
    val indexCols =
      spark.read.parquet(s"$dir/buckets").columns ++ spark.read.parquet(s"$dir/sets").columns
    assert(!indexCols.contains("text"))
  }

  test("oversized increments drop the broadcast hints but keep the answer") {
    // the probe's broadcast hints are gated on the session's broadcast
    // budget: an increment whose size estimate exceeds it must fall back
    // to the optimizer-chosen (shuffle-degradable) plan rather than force
    // a broadcast that can exhaust driver memory — and the answer must
    // not change. Budget 0 disables broadcasting entirely, so any
    // BroadcastExchange in the probe plan would prove the hint was forced.
    val dir = buildIndex(corpus)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val (plan, rows) = scopedNoLeak {
        val frame = Dedup.incrementalNearDupPairs(spark, dir, increment, threshold = 0.5)
        (frame.queryExecution.executedPlan.toString,
          frame.orderBy("id_a", "id_b").collect())
      }
      assert(!plan.contains("BroadcastExchange"),
        "broadcast hint survived a disabled broadcast budget")
      val inc = rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      spark.conf.set(key, saved)
      val hinted = scopedNoLeak(
        Dedup.incrementalNearDupPairs(spark, dir, increment, threshold = 0.5)
          .orderBy("id_a", "id_b").collect())
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(inc == hinted, s"gated plan changed the answer: $inc vs $hinted")
    } finally spark.conf.set(key, saved)
  }

  test("probe parameters come from the index meta, surviving non-default builds") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mh_index").toString
    Dedup.writeMinhashIndex(corpus, dir, numHashes = 64, bands = 16, seed = 7L)
    val inc = scopedNoLeak(
      Dedup.incrementalNearDupPairs(spark, dir, increment, threshold = 0.5)
        .orderBy("id_a", "id_b").collect())
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc.contains((2L, 10L)) && inc.contains((11L, 12L)))
  }
}
