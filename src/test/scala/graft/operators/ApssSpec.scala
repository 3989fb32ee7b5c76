package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** All-pairs TF-IDF cosine top-k (q152): identical docs score 1.0 at
  * rank 1, dimension-disjoint docs never pair, and the exact-top-k
  * claim (candidates = any shared shingle) holds on planted data.
  */
class ApssSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta epsilon"),
    (2L, "alpha beta gamma delta epsilon"), // exact copy of 1
    (3L, "alpha beta gamma zeta eta"),      // shares the leading shingle
    (4L, "iota kappa lambda mu nu"),        // disjoint dimensions
    (5L, "one two")                          // < 3 tokens: no dimensions
  ).toDF("doc_id", "text")

  private lazy val out = CacheScope.scoped {
    Apss.tfidfCosineTopK(docs).orderBy("doc_id", "sim_rank").collect()
  }

  test("an exact copy ranks first with cosine 1.0") {
    val r1 = out.filter(r => r.getLong(0) == 1L && r.getLong(1) == 1L)
    assert(r1.length == 1 && r1(0).getLong(2) == 2L && r1(0).getDouble(3) == 1.0)
    val r2 = out.filter(r => r.getLong(0) == 2L && r.getLong(1) == 1L)
    assert(r2(0).getLong(2) == 1L && r2(0).getDouble(3) == 1.0)
  }

  test("dimension-disjoint and sub-n docs never appear") {
    assert(!out.exists(r => r.getLong(0) == 4L || r.getLong(2) == 4L))
    assert(!out.exists(r => r.getLong(0) == 5L || r.getLong(2) == 5L))
  }

  test("partial overlap scores strictly between 0 and 1 and is symmetric") {
    val a = out.filter(r => r.getLong(0) == 1L && r.getLong(2) == 3L)
    val b = out.filter(r => r.getLong(0) == 3L && r.getLong(2) == 1L)
    assert(a.length == 1 && b.length == 1)
    assert(a(0).getDouble(3) == b(0).getDouble(3))
    assert(a(0).getDouble(3) > 0.0 && a(0).getDouble(3) < 1.0)
  }

  test("ranks are dense 1..k per doc, ordered by cosine then id") {
    val byDoc = out.groupBy(_.getLong(0))
    for ((_, rows) <- byDoc) {
      val rks = rows.map(_.getLong(1)).toSeq.sorted
      assert(rks == (1L to rks.length))
      val cosines = rows.sortBy(_.getLong(1)).map(_.getDouble(3)).toSeq
      assert(cosines == cosines.sorted.reverse)
    }
  }
}
