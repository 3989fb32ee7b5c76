package graft.operators

import graft.SparkTestBase

/** [[C4Rules]] — line rules (terminal punctuation, min words,
  * javascript), page rules (lorem ipsum, curly brace, min kept lines),
  * order preservation, and the scan-shaped plan.
  */
class C4RulesSpec extends SparkTestBase {
  import spark.implicits._

  private def run(pages: Seq[(Long, String)]): Map[Long, (Boolean, Long, Long, String)] =
    C4Rules.clean(pages.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap

  test("line rules: punctuation, word minimum, javascript — in original order") {
    val got = run(Seq((1L, Seq(
      "A good first sentence stays.",       // kept
      "no terminal punctuation here",        // dropped: no [.!?"]
      "Too short.",                          // dropped: 2 words
      "Does Javascript count as a word?",    // dropped: javascript
      "Quoted lines also survive the cut!",  // kept
      "\"Even a quote-terminated line.\""    // kept: ends with "
    ).mkString("\n"))))
    val (kept, nLines, nKept, clean) = got(1L)
    assert(nLines == 6L && nKept == 3L && kept)
    assert(clean == Seq("A good first sentence stays.",
      "Quoted lines also survive the cut!",
      "\"Even a quote-terminated line.\"").mkString("\n"))
  }

  test("page rules: lorem ipsum and curly brace kill the page; audit columns survive") {
    val got = run(Seq(
      (1L, "Lorem Ipsum dolor sit amet.\nA perfectly fine second line."),
      (2L, "A config block { nested } ruins the page.\nAnother good line here."),
      (3L, "First decent line of prose.\nSecond decent line of prose.")))
    assert(!got(1L)._1 && !got(2L)._1 && got(3L)._1)
    // dropped pages still report their line accounting
    assert(got(1L)._3 == 2L, "lorem-ipsum page keeps its audit columns")
  }

  test("min kept lines: a page below the floor drops even when clean") {
    val got = run(Seq(
      (1L, "Only one line survives this page.\nnope\nnah"),
      (2L, "Two lines survive this page easily.\nAnd here is the second one.")))
    assert(!got(1L)._1 && got(1L)._3 == 1L)
    assert(got(2L)._1)
  }

  test("word count splits on whitespace RUNS: multi-space/tab gaps are one separator") {
    val got = run(Seq(
      (1L, "a  b."),                       // 2 true words, NOT 3 — dropped
      (2L, "one \t two   three words here."))) // tabs + runs: 5 words — kept
    assert(got(1L)._3 == 0L, "double-space two-word line must not pass the 3-word floor")
    assert(got(2L)._3 == 1L && got(2L)._4 == "one \t two   three words here.")
  }

  test("the operator is scan-shaped: no exchange in the plan") {
    val plan = C4Rules.clean(Seq((1L, "x.")).toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
