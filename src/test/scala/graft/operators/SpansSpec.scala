package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.TextFunctions._

/** Repeated-span coverage ([[Spans.repeatedSpanCoverage]]) on planted
  * spans, plus parity of the compiled positional window-hash kernel
  * against the declarative HOF reference.
  */
class SpansSpec extends SparkTestBase {
  import spark.implicits._

  // k = 3 throughout; sentinel tokens are unique per doc except the
  // deliberately planted shared spans
  private lazy val docs = Seq(
    // A/B share the 4-token span s1..s4 (two overlapping windows -> ONE span)
    (0L, "u1 u2 s1 s2 s3 s4 u3"),
    (1L, "v1 s1 s2 s3 s4 v2"),
    // unique doc: zero coverage, must still be present
    (2L, "c1 c2 c3 c4 c5"),
    // D/E share TWO disjoint spans -> two spans each
    (3L, "s1 s2 s3 x1 x2 x3 t1 t2 t3"),
    (4L, "y1 s1 s2 s3 y2 t1 t2 t3 y3"),
    // shorter than k: no windows at all
    (5L, "one two"),
    // within-doc repetition only: df counts DISTINCT docs, so no hits
    (6L, "r1 r2 r3 r1 r2 r3"),
    // I: hits at pos 0 and pos 3 == prev + k -> contiguous coverage, ONE
    // merged span; J: same two spans one token apart -> TWO spans
    (7L, "s1 s2 s3 q1 q2 q3"),
    (8L, "s1 s2 s3 z1 q1 q2 q3"),
    // K/L share only a 2-token span < k: invisible by contract
    (9L, "k1 k2 m1 m2"),
    (10L, "k3 m1 m2 k4")
  ).toDF("doc_id", "text")

  test("planted spans: merge, disjoint spans, boundary, sub-k invisibility") {
    val out = CacheScope.scoped {
      Spans.repeatedSpanCoverage(docs, k = 3)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSeq
    }
    val expected = Seq(
      (0L, 7L, 4L, 1L, 0.571429), // s1..s4: overlapping windows merged
      (1L, 6L, 4L, 1L, 0.666667),
      (2L, 5L, 0L, 0L, 0.0),
      (3L, 9L, 6L, 2L, 0.666667), // two disjoint 3-token spans
      (4L, 9L, 6L, 2L, 0.666667),
      (5L, 2L, 0L, 0L, 0.0),      // shorter than k
      (6L, 6L, 0L, 0L, 0.0),      // within-doc repeat is not cross-doc
      (7L, 6L, 6L, 1L, 1.0),      // pos == prev+k: contiguous -> one span
      (8L, 7L, 6L, 2L, 0.857143), // one token of slack -> two spans
      (9L, 4L, 0L, 0L, 0.0),      // shared span shorter than k
      (10L, 4L, 0L, 0L, 0.0)
    )
    assert(out == expected)
  }

  test("minDocs raises the repetition bar") {
    // the s-span is shared by 6 docs, the t-span by 2: at minDocs = 3 the
    // t-span stops counting
    val out = CacheScope.scoped {
      Spans.repeatedSpanCoverage(docs, k = 3, minDocs = 3)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    }
    val byId = out.map(t => t._1 -> (t._2, t._3)).toMap
    assert(byId(3L) == (3L, 1L), "t-span must drop at minDocs=3")
    assert(byId(4L) == (3L, 1L))
    // A keeps only the (s1 s2 s3) window — its (s2 s3 s4) window is
    // shared with B alone, which is below the bar now
    assert(byId(0L) == (3L, 1L), "the 6-doc s-span window must survive")
  }

  private def referenceHashes(c: org.apache.spark.sql.Column, n: Int) =
    transform(wordShingles(c, n), g => xxhash64(g))

  test("window-hash kernel equals xxhash64 over the declarative window form") {
    val texts = Seq(
      "", "   ", "one", "one two", "a b c", "a b c d e",
      "rep rep rep rep", // duplicates KEPT, in order (unlike shingleSet)
      "The  Quick   brown FOX  the quick brown fox",
      "x " * 200 + "tail")
    val rows = texts.toDF("t").select(
      shingleWindowHashes($"t", 3).as("kernel"),
      referenceHashes($"t", 3).as("ref")).collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"mismatch for input '$t'")
    }
  }

  test("window-hash kernel equals the reference on the documents table") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val mism = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(shingleWindowHashes(col("text"), 8).as("kernel"),
        referenceHashes(col("text"), 8).as("ref"))
      .filter(not(col("kernel") === col("ref")))
      .count()
    assert(mism == 0L)
  }

  test("stripIncrement equals the full-corpus strip restricted to the increment") {
    // corpus = docs 0..6, increment = 7..10: exercises corpus-owned
    // windows reaching into the increment (s1 s2 s3, owner doc 0) and
    // increment-internal repeats (q1 q2 q3 in 7/8, owner 7 keeps)
    CacheScope.scoped {
      val corpus = docs.filter(col("doc_id") < 7)
      val inc = docs.filter(col("doc_id") >= 7)
      val full = java.nio.file.Files.createTempDirectory("spanfull").toString
      val corp = java.nio.file.Files.createTempDirectory("spancorp").toString
      Spans.writeSpanIndex(docs, full, k = 3)
      Spans.writeSpanIndex(corpus, corp, k = 3)
      val want = Spans.stripRepeatedSpans(spark, full, inc)
        .orderBy("doc_id").collect().toSeq
      val got = Spans.stripIncrement(spark, corp, inc)
        .orderBy("doc_id").collect().toSeq
      assert(got === want)
      assert(got.exists(_.getLong(2) > 0L), "fixture must strip something")
    }
  }

  test("stripIncrement ownership: an increment doc with the smallest id OWNS the window") {
    // no id-order assumption: increment ids straddle the corpus id —
    // inc doc 5 < corpus doc 10, so 5 owns 'w1 w2 w3' and keeps it
    // while inc doc 20 strips; the full-index strip agrees
    CacheScope.scoped {
      val corpus = Seq((10L, "w1 w2 w3 a1 a2")).toDF("doc_id", "text")
      val inc = Seq(
        (5L, "w1 w2 w3 b1 b2"),
        (20L, "c1 w1 w2 w3 c2")).toDF("doc_id", "text")
      val full = java.nio.file.Files.createTempDirectory("spanfull2").toString
      val corp = java.nio.file.Files.createTempDirectory("spancorp2").toString
      Spans.writeSpanIndex(corpus.unionByName(inc), full, k = 3)
      Spans.writeSpanIndex(corpus, corp, k = 3)
      val want = Spans.stripRepeatedSpans(spark, full, inc)
        .orderBy("doc_id").collect().toSeq
      val got = Spans.stripIncrement(spark, corp, inc)
        .orderBy("doc_id").collect().toSeq
      assert(got === want)
      val byId = got.map(r => r.getLong(0) -> r.getString(3)).toMap
      assert(byId(5L) == "w1 w2 w3 b1 b2", "owner keeps its copy")
      assert(byId(20L) == "c1 c2", "non-owner strips the corpus-shared window")
    }
  }

  test("stripMatching excises every eval-matching window, no ownership rule") {
    CacheScope.scoped {
      val evalD = Seq((100L, "e1 e2 e3 f1 f2 f3")).toDF("doc_id", "text")
      val train = Seq(
        (1L, "a1 a2 e1 e2 e3 a3"),   // quotes an eval 3-window -> excised
        (2L, "e1 e2 e3"),             // the WHOLE doc is eval text -> ''
        (3L, "b1 e1 e2 b2 b3 b4"),    // only a 2-token eval overlap: < k, kept
        (4L, "c1 c2 c3 c4")           // clean
      ).toDF("doc_id", "text")
      val got = Spans.stripMatching(spark, train, evalD, k = 3)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSeq
      assert(got == Seq(
        (1L, 3L, "a1 a2 a3"),
        (2L, 3L, ""),
        (3L, 0L, "b1 e1 e2 b2 b3 b4"),
        (4L, 0L, "c1 c2 c3 c4")))
    }
  }

  test("null tokens yield null elements at their positions, not shifted hashes") {
    val arr = array(lit("a"), lit(null).cast("string"), lit("b"), lit("c"))
    val row = Seq(1).toDF("i").select(
      graft.functions.expr.ShingleFunctions.shingleWindowHashes(arr, 2).as("hs"),
      xxhash64(lit("b c")).as("bc")).collect()(0)
    val hs = row.getSeq[Any](0)
    assert(hs.size == 3)
    assert(hs(0) == null && hs(1) == null, "windows touching the null token")
    assert(hs(2) == row.getLong(1), "position 2 must be hash('b c')")
  }
}
