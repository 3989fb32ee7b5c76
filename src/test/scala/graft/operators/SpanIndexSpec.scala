package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The staged window-hash span index ([[Spans.writeSpanIndex]]) and its
  * three consumers: the full audit read off the stage, the incremental
  * probe (corpus participates only through its stored df), and the
  * within-source boilerplate audit.
  */
class SpanIndexSpec extends SparkTestBase {
  import spark.implicits._

  /** Delta-based leak check (the MinhashIndexSpec convention): only
    * blocks NEW inside the scope count.
    */
  private def scopedNoLeak[A](body: => A): A = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = CacheScope.scoped(body)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"operator leaked persisted blocks past its CacheScope: $leaked")
    out
  }

  // k = 3 throughout. Corpus: A/B share s1..s4; C unique; D carries the
  // t-span once (not yet repeated inside the corpus)
  private lazy val corpus = Seq(
    (0L, "u1 u2 s1 s2 s3 s4 u3"),
    (1L, "v1 s1 s2 s3 s4 v2"),
    (2L, "c1 c2 c3 c4 c5"),
    (3L, "d1 t1 t2 t3 d2")
  ).toDF("doc_id", "text")

  // increment: 10 shares the corpus-repeated s-span (corpus df 2),
  // 11 shares the t-span with corpus doc 3 ONLY (corpus df 1 + inc df 1
  // -> repeated), 12/13 share a span only with each other (corpus df 0),
  // 14 is clean
  private lazy val increment = Seq(
    (10L, "w1 s1 s2 s3 w2"),
    (11L, "e1 e2 t1 t2 t3"),
    (12L, "p1 p2 p3 f1"),
    (13L, "g1 p1 p2 p3"),
    (14L, "z1 z2 z3 z4 z5")
  ).toDF("doc_id", "text")

  private def buildIndex(docs: org.apache.spark.sql.DataFrame,
      k: Int = 3, carry: Seq[String] = Nil): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_span_index").toString
    Spans.writeSpanIndex(docs, dir, k = k, carry = carry)
    dir
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq

  test("from-index audit == the in-memory operator on the same corpus") {
    val all = corpus.union(increment)
    val dir = buildIndex(all)
    val fromIndex = scopedNoLeak(
      rows(Spans.repeatedSpanCoverageFromIndex(spark, dir)))
    val inMemory = scopedNoLeak(
      rows(Spans.repeatedSpanCoverage(all, k = 3)))
    assert(fromIndex == inMemory)
    assert(fromIndex.nonEmpty && fromIndex.exists(_._3 > 0L),
      "fixture must exercise nonzero coverage")
  }

  test("incremental coverage == full-corpus audit restricted to the increment") {
    val dir = buildIndex(corpus)
    val inc = scopedNoLeak(
      rows(Spans.incrementalSpanCoverage(spark, dir, increment)))
    val full = scopedNoLeak(
      rows(Spans.repeatedSpanCoverage(corpus.union(increment), k = 3)))
      .filter(_._1 >= 10L)
    assert(inc == full, s"incremental $inc vs full-restricted $full")
    val byId = inc.map(t => t._1 -> t._3).toMap
    assert(byId(10L) > 0L, "corpus-repeated span must cover the increment doc")
    assert(byId(11L) > 0L, "corpus df 1 + increment df 1 must reach the bar")
    assert(byId(12L) > 0L && byId(13L) > 0L, "intra-increment repetition counts")
    assert(byId(14L) == 0L, "clean doc must report zero coverage")
  }

  test("the incremental probe reads ONLY the index — never the corpus text") {
    val corpusDir = java.nio.file.Files.createTempDirectory("graft_span_corpus").toString + "/docs"
    corpus.write.parquet(corpusDir)
    val dir = buildIndex(spark.read.parquet(corpusDir))
    val frame = Spans.incrementalSpanCoverage(spark, dir, increment)
    val files = frame.inputFiles
    assert(files.nonEmpty)
    assert(files.forall(_.contains(dir.substring(dir.lastIndexOf('/') + 1))),
      s"probe plan reads outside the index: ${files.filterNot(_.contains(dir)).take(3).toSeq}")
    assert(!files.exists(_.contains("graft_span_corpus")),
      "probe plan reads the corpus documents themselves")
    // and structurally: the index stores hashes and counts, never text
    val indexCols =
      spark.read.parquet(s"$dir/docs").columns ++ spark.read.parquet(s"$dir/df").columns
    assert(!indexCols.contains("text"))
  }

  test("probe width comes from the index meta, surviving non-default builds") {
    // k = 4: the 3-token t/p spans fall below the bar; only the 4-token
    // s-span doc (10) keeps coverage
    val dir = buildIndex(corpus, k = 4)
    val inc = scopedNoLeak(
      rows(Spans.incrementalSpanCoverage(spark, dir, increment)))
    val byId = inc.map(t => t._1 -> t._3).toMap
    assert(byId(11L) == 0L && byId(12L) == 0L && byId(13L) == 0L,
      "3-token spans must be invisible at the index's k=4")
    // doc 10 has only 3 s-tokens (w1 s1 s2 s3 w2): no 4-token shared window
    assert(inc.forall(_._3 == 0L), "no 4-token window is shared in this fixture")
  }

  test("within-group audit: repetition only counts inside the group") {
    // the x-span repeats WITHIN source a; the y-span repeats only ACROSS
    // sources (a+b) and must be invisible; the z-span repeats within b
    val docs = Seq(
      (0L, "a", "x1 x2 x3 u1 y1 y2 y3"),
      (1L, "a", "u2 x1 x2 x3 u3"),
      (2L, "b", "y1 y2 y3 u4"),
      (3L, "b", "u5 z1 z2 z3"),
      (4L, "b", "z1 z2 z3 u6"),
      (5L, "a", "clean doc here")
    ).toDF("doc_id", "source", "text")
    val dir = buildIndex(docs, carry = Seq("source"))
    val out = scopedNoLeak(
      Spans.groupedSpanCoverageFromIndex(spark, dir, groupCol = "source")
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(4))).toSeq)
    val expected = Seq(
      (0L, "a", 3L, 1L), // x-span only; the cross-source y-span is invisible
      (1L, "a", 3L, 1L),
      (2L, "b", 0L, 0L), // its only shared span is cross-source
      (3L, "b", 3L, 1L),
      (4L, "b", 3L, 1L),
      (5L, "a", 0L, 0L)
    )
    assert(out == expected)
    // the same corpus WITHOUT grouping flags the y-span too
    val global = scopedNoLeak(
      rows(Spans.repeatedSpanCoverageFromIndex(spark, dir)))
    assert(global.find(_._1 == 2L).get._3 == 3L,
      "globally the y-span IS repeated — the group scope is what hides it")
  }

  test("strip: owners keep their copy, non-owners lose the span's tokens") {
    // s-span owner = 0; a-span and b-span owner = 4; doc 7 owns neither
    val docs = Seq(
      (0L, "u1 u2 s1 s2 s3 s4 u3"),
      (1L, "v1 s1 s2 s3 s4 v2"),
      (2L, "c1 c2 c3"),
      (3L, "s1 s2 s3"),
      (4L, "a1 a2 a3 b1 b2 b3"),
      (5L, "a1 a2 a3 x1"),
      (6L, "y1 b1 b2 b3"),
      (7L, "s1 s2 s3 a1 a2 a3")
    ).toDF("doc_id", "text")
    val dir = buildIndex(docs)
    val out = scopedNoLeak(
      Spans.stripRepeatedSpans(spark, dir, docs)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq)
    val expected = Seq(
      (0L, 7L, 0L, "u1 u2 s1 s2 s3 s4 u3"), // owner of every s-window
      (1L, 6L, 4L, "v1 v2"),                // overlapping windows merge before removal
      (2L, 3L, 0L, "c1 c2 c3"),             // unique doc untouched
      (3L, 3L, 3L, ""),                     // fully repeated, fully removed
      (4L, 6L, 0L, "a1 a2 a3 b1 b2 b3"),    // owner of both its spans
      (5L, 4L, 3L, "x1"),
      (6L, 4L, 3L, "y1"),
      (7L, 6L, 6L, "")                      // owns neither span -> loses both
    )
    assert(out == expected)
  }

  test("strip output is the NORMALIZED token stream") {
    val docs = Seq(
      (0L, "  The   QUICK brown fox  "),
      (1L, "unrelated content entirely here")
    ).toDF("doc_id", "text")
    val dir = buildIndex(docs)
    val out = scopedNoLeak(
      Spans.stripRepeatedSpans(spark, dir, docs)
        .orderBy("doc_id").collect().map(_.getString(3)).toSeq)
    assert(out.head == "the quick brown fox",
      "whitespace collapsed + lowercased — the family's tokenization")
  }

  test("an index built without the carry column refuses the grouped audit") {
    val dir = buildIndex(corpus)
    val e = intercept[IllegalArgumentException] {
      Spans.groupedSpanCoverageFromIndex(spark, dir, groupCol = "source")
    }
    assert(e.getMessage.contains("source"))
  }
}
