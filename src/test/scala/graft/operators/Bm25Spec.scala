package graft.operators

import graft.SparkTestBase

class Bm25Spec extends SparkTestBase {
  import spark.implicits._

  // tiny corpus with controlled term statistics:
  //  - "common" appears in every doc (near-zero idf)
  //  - "rare" appears only in docs 1 and 2
  //  - doc 1 also repeats "rare" (tf weighting)
  //  - doc 4 is long padding (length normalization)
  private lazy val docs = Seq(
    (1L, "rare rare common pad pad"),
    (2L, "rare common pad pad pad"),
    (3L, "common pad pad pad pad"),
    (4L, "common pad pad pad pad pad pad pad pad pad pad pad pad pad pad")
  ).toDF("doc_id", "text")

  private def results(queries: Seq[(String, Seq[String])], k: Int = 10) =
    Bm25.search(docs, queries, k)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("rare-term docs outrank common-term docs; tf breaks the tie") {
    val r = results(Seq("q" -> Seq("rare", "common")))
    val order = r.sortBy(_._2).map(_._3).toSeq
    // doc1 (tf=2 on rare) > doc2 (tf=1 on rare) > the rare-less docs
    assert(order.take(2) == Seq(1L, 2L), s"got $order")
    assert(Set(order(2), order(3)) == Set(3L, 4L))
  }

  test("length normalization: shorter doc wins on an equal-tf common term") {
    val r = results(Seq("q" -> Seq("common")))
    val order = r.sortBy(_._2).map(_._3).toSeq
    // all tf=1; the three 5-token docs tie (doc_id order), 15-token doc 4 last
    assert(order == Seq(1L, 2L, 3L, 4L), s"got $order")
  }

  test("k bounds the result per query; ranks are 1..k dense") {
    val r = results(Seq("a" -> Seq("common"), "b" -> Seq("pad")), k = 2)
    assert(r.count(_._1 == "a") == 2 && r.count(_._1 == "b") == 2)
    assert(r.filter(_._1 == "a").map(_._2).sorted.toSeq == Seq(1L, 2L))
  }

  test("queries with no matching terms produce no rows (not errors)") {
    assert(results(Seq("q" -> Seq("absent"))).isEmpty)
  }

  test("deterministic across evaluations and tie-broken by doc_id") {
    val a = results(Seq("q" -> Seq("rare", "common", "pad")))
    val b = results(Seq("q" -> Seq("rare", "common", "pad")))
    assert(a.toSeq == b.toSeq)
    // equal rounded scores must rank by ascending doc_id
    val byScore = a.groupBy(_._4).values.filter(_.length > 1)
    byScore.foreach { g =>
      assert(g.sortBy(_._2).map(_._3).toSeq == g.map(_._3).sorted.toSeq)
    }
  }
}
