package graft.operators

import graft.SparkTestBase

/** [[ParagraphDedup.stripDuplicatedParagraphs]] — CCNet keep-first
  * paragraph dedup.
  */
class ParagraphDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], sep: String = "\n")
      : Map[Long, (Long, Long, String)] =
    ParagraphDedup.stripDuplicatedParagraphs(
        rows.toDF("id", "text"), "id", "text", sep)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("keep-first: the globally first occurrence survives, all later copies drop") {
    val got = run(Seq(
      1L -> "header\nunique one\nfooter",
      2L -> "header\nunique two\nfooter",
      3L -> "header\nunique three\nfooter"))
    assert(got(1L) === ((3L, 3L, "header\nunique one\nfooter")))
    assert(got(2L) === ((3L, 1L, "unique two")))
    assert(got(3L) === ((3L, 1L, "unique three")))
  }

  test("a document whose every paragraph is a later copy comes back empty, not missing") {
    val got = run(Seq(
      1L -> "alpha\nbeta",
      2L -> "alpha\nbeta"))
    assert(got(1L) === ((2L, 2L, "alpha\nbeta")))
    assert(got(2L) === ((2L, 0L, "")))
  }

  test("the match key is lowercase+trim but survivors keep original bytes") {
    val got = run(Seq(
      1L -> "  Hello World \nrest",
      2L -> "hello world\nother"))
    // doc 2's "hello world" is a later copy of doc 1's normalized form
    assert(got(1L) === ((2L, 2L, "  Hello World \nrest")))
    assert(got(2L) === ((2L, 1L, "other")))
  }

  test("within-document order is preserved after drops in the middle") {
    val got = run(Seq(
      1L -> "dup",
      2L -> "a\ndup\nb\ndup\nc"))
    // doc 1 owns "dup"; doc 2 keeps a, b, c in order (both copies drop)
    assert(got(2L) === ((5L, 3L, "a\nb\nc")))
  }

  test("a regex-metacharacter separator is treated literally") {
    val got = run(Seq(1L -> "x|x|y", 2L -> "y|z"), sep = "|")
    assert(got(1L) === ((3L, 2L, "x|y")))
    assert(got(2L) === ((2L, 1L, "z")))
  }

  test("ties inside one document resolve to the earliest position") {
    val got = run(Seq(1L -> "same\nsame\nsame"))
    assert(got(1L) === ((3L, 1L, "same")))
  }

  private def runIncremental(corpus: Seq[(Long, String)], inc: Seq[(Long, String)])
      : Map[Long, (Long, Long, String)] = {
    val corpusFirst = ParagraphDedup.firstOccurrences(
      ParagraphDedup.paragraphs(corpus.toDF("id", "text"), "id", "text"))
    ParagraphDedup.stripIncrement(
        inc.toDF("id", "text"), corpusFirst, "id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
  }

  test("incremental == from-scratch restricted to the increment (bridge cases included)") {
    val corpus = Seq(1L -> "header\ncorpus one", 2L -> "header\ncorpus two")
    val inc = Seq(
      10L -> "header\nfresh ten", // header known to the corpus -> drops
      11L -> "incdup\nfresh eleven", // incdup is NEW, first inc copy kept
      12L -> "incdup\nheader") // later inc copy + corpus-known -> both drop
    val got = runIncremental(corpus, inc)
    val scratch = run(corpus ++ inc)
    assert(got === scratch.filter(_._1 >= 10L))
    assert(got(10L) === ((2L, 1L, "fresh ten")))
    assert(got(11L) === ((2L, 2L, "incdup\nfresh eleven")))
    assert(got(12L) === ((2L, 0L, "")))
  }

  test("incremental with an empty corpus state degrades to plain dedup of the increment") {
    val inc = Seq(1L -> "a\nb", 2L -> "a\nc")
    val empty = ParagraphDedup.firstOccurrences(
      ParagraphDedup.paragraphs(Seq.empty[(Long, String)].toDF("id", "text"), "id", "text"))
    val got = ParagraphDedup.stripIncrement(inc.toDF("id", "text"), empty, "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got === run(inc))
  }
}
