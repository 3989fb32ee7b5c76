package graft.operators

import graft.SparkTestBase

/** [[PhraseSearch]] — alignment-join exact phrase matching. */
class PhraseSearchSpec extends SparkTestBase {
  import spark.implicits._

  private def phraseRows(ps: Map[Long, Seq[String]]) =
    ps.toSeq.flatMap { case (id, terms) =>
      terms.zipWithIndex.map { case (t, o) => (id, o.toLong, t) }
    }.toDF("phrase_id", "offset", "term")

  private def occ(docs: Seq[(Long, String)], ps: Map[Long, Seq[String]]): Set[(Long, Long, Long)] = {
    val post = PhraseSearch.postings(docs.toDF("doc_id", "text"))
    PhraseSearch.occurrences(post, phraseRows(ps))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("exact consecutive match only — both-words-present-apart does not match") {
    val docs = Seq((1L, "spark sql engine"), (2L, "sql on spark"), (3L, "spark and sql"))
    assert(occ(docs, Map(1L -> Seq("spark", "sql"))) === Set((1L, 1L, 0L)))
  }

  test("overlapping and repeated occurrences all surface, with starts") {
    val docs = Seq((7L, "a a a b"))
    assert(occ(docs, Map(1L -> Seq("a", "a"))) === Set((1L, 7L, 0L), (1L, 7L, 1L)))
  }

  test("repeated-term phrase needs no special case") {
    val docs = Seq((1L, "b a b a b"), (2L, "b a a b"))
    assert(occ(docs, Map(9L -> Seq("b", "a", "b"))) ===
      Set((9L, 1L, 0L), (9L, 1L, 2L)))
  }

  test("three-term phrase across normalization (case/whitespace folding)") {
    val docs = Seq((4L, "  The   QUICK brown fox "))
    assert(occ(docs, Map(2L -> Seq("quick", "brown", "fox"))) === Set((2L, 4L, 1L)))
  }

  test("non-contiguous phrase offsets fail fast") {
    val docs = Seq((1L, "x y"))
    val bad = Seq((5L, 0L, "x"), (5L, 2L, "y")).toDF("phrase_id", "offset", "term")
    val ex = intercept[Exception] {
      PhraseSearch.occurrences(PhraseSearch.postings(docs.toDF("doc_id", "text")), bad).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("PhraseSearch")))
  }
}
