package graft.operators

import graft.SparkTestBase

class ContaminationSpec extends SparkTestBase {
  import spark.implicits._

  // two corpus docs share the hot 5-gram "the quick brown fox jumps" (one
  // in scrambled case/whitespace — normalization must still match it)
  private lazy val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "THE QUICK  brown fox JUMPS far away tonight"),
    (2L, "completely unrelated corpus text about cooking pasta sauce")
  ).toDF("doc_id", "text")

  private lazy val eval = Seq(
    (10L, "a b the quick brown fox jumps x y"), // 5 grams, 1 contaminated
    (11L, "nothing here overlaps with any training document at all"), // clean
    (12L, "too short text") // < n tokens: no probe surface
  ).toDF("doc_id", "text")

  private def run() =
    Dedup.evalContamination(corpus, eval, n = 5)
      .orderBy("eval_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq

  test("a corpus 5-gram contaminates an eval doc ONCE, however often the corpus repeats it") {
    // "the quick brown fox jumps" appears in BOTH corpus docs; eval 10 has
    // 5 distinct 5-grams of which exactly that one matches
    assert(run().head == (10L, 5L, 1L, 0.2))
  }

  test("a clean eval doc is kept with zero matches, not dropped") {
    assert(run()(1) == (11L, 5L, 0L, 0.0))
  }

  test("an eval doc shorter than n tokens has no probe surface and is absent") {
    assert(run().map(_._1) == Seq(10L, 11L))
  }

  test("the corpus side streams through a broadcast join — no corpus-keyed exchange") {
    val df = Dedup.evalContamination(corpus, eval, n = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
  }
}
