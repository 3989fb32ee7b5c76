package graft.operators

import graft.SparkTestBase

class GopherSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]): Map[Long, (Long, Double, Double, Double, Long, Boolean)] =
    Gopher.metrics(rows.toDF("doc_id", "text"),
        minWords = 4, minStopwords = 1)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5), r.getBoolean(6))))
      .toMap

  test("each rule drops exactly its planted violator; the clean doc keeps") {
    val out = run(Seq(
      (0L, "the quick brown fox jumps over lazy dogs"),     // clean -> keep
      (1L, "too short the"),                                // < 4 words
      (2L, "123 456 789 000 111 the 222"),                  // alpha frac 1/7
      (3L, "the ### cat ### sat ### mat ### here ### now"), // symbol ratio 5/11
      (4L, "cat dog sat mat run sun fun hat"),              // no stopword
      (5L, "")))                                            // empty
    assert(out(0L)._6, s"clean doc must keep: ${out(0L)}")
    assert(!out(1L)._6 && out(1L)._1 == 3)
    assert(!out(2L)._6 && out(2L)._3 == math.rint(1e6 / 7.0) / 1e6)
    // each '#' counts: 5 x '###' = 15 symbol hits over 11 words
    assert(!out(3L)._6 && out(3L)._4 == math.rint(15e6 / 11.0) / 1e6)
    assert(!out(4L)._6 && out(4L)._5 == 0)
    assert(out(5L) == ((0L, 0.0, 0.0, 0.0, 0L, false)))
  }

  test("mean word length is exact from the normalized text and bounds apply") {
    // 5 words of lengths 2,2,2,2,2 -> mean 2.0 (< 3) -> drop
    val short = run(Seq((0L, "ab cd ef gh th")))
    assert(short(0L)._2 == 2.0 && !short(0L)._6)
    // long words: mean > 10 -> drop (stopword present, enough words)
    val long = run(Seq((1L, "the abcdefghijklmnop qrstuvwxyzabcdef ghijklmnopqrstuvw xyzabcdefghijklmn")))
    assert(long(1L)._2 > 10.0 && !long(1L)._6)
  }

  test("stop_present counts DISTINCT stopwords present, not occurrences") {
    val out = run(Seq((0L, "the the the the and and with cat")))
    assert(out(0L)._5 == 3)
  }

  test("normalization feeds the metrics: case and whitespace collapse first") {
    val a = run(Seq((0L, "THE   Quick   Brown   Fox   Jumps")))
    val b = run(Seq((0L, "the quick brown fox jumps")))
    assert(a == b)
  }
}
