package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.expr.UnigramFunctions

/** Unigram-LM Viterbi tokenizer (q145): training keep rules, DP
  * optimality + tie rule, kernel == reference parity, coverage via the
  * unk fallback, and save/load round-trip.
  */
class UnigramTokenizerSpec extends SparkTestBase {
  import spark.implicits._

  // hand-built model: scores in micro-nats (more frequent = higher)
  private val model = UnigramTokenizer.Model(Seq(
    "h" -> -3000000L, "e" -> -3100000L, "l" -> -2900000L, "o" -> -3200000L,
    "he" -> -4000000L, "ll" -> -4100000L, "llo" -> -5000000L,
    "hell" -> -5500000L), maxPieceLen = 4)

  test("Viterbi picks the globally best segmentation") {
    // hell+o = -8.7M beats he+llo = -9.0M and all char paths
    val (v, ps) = UnigramTokenizer.segment("hello", model)
    assert(ps == Seq("hell", "o") && v == -8700000L)
  }

  test("tie rule: equal scores resolve to the shortest final piece") {
    val tied = UnigramTokenizer.Model(Seq(
      "a" -> -1000000L, "b" -> -1000000L, "ab" -> -2000000L), maxPieceLen = 4)
    // ab: "ab" (1 piece) and "a b" (2 pieces) both score -2M;
    // largest split point wins -> final piece "b" (two pieces)
    val (v, ps) = UnigramTokenizer.segment("ab", tied)
    assert(v == -2000000L && ps == Seq("a", "b"))
  }

  test("unknown single codepoints fall back to unkMicro, never fail") {
    val (v, ps) = UnigramTokenizer.segment("hxe", model)
    assert(ps == Seq("h", "x", "e"))
    assert(v == -3000000L + model.unkMicro + -3100000L)
  }

  test("compiled kernel == reference segmentation on every corpus word") {
    val words = Seq("hello", "hell", "he", "lo", "ohe", "xyz", "hellohello",
      "l", "olleh").toDF("word")
    val viaKernel = words
      .select(col("word"), UnigramFunctions.unigramSegment(col("word"), model).as("t"))
      .select(col("word"), col("t.score_micro"), col("t.n_pieces"), col("t.seg"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getInt(2), r.getString(3))))
      .toMap
    for (w <- viaKernel.keys) {
      val (v, ps) = UnigramTokenizer.segment(w, model)
      assert(viaKernel(w) == ((v, ps.length, ps.mkString(" "))),
        s"kernel/reference diverge on '$w'")
    }
  }

  test("training keeps all singles, counted multis, top-V rank rule") {
    val wf = Seq(("aab", 10L), ("ab", 5L), ("b", 1L)).toDF("w", "f")
    val m = UnigramTokenizer.train(wf, maxPieceLen = 3, minCount = 2, vocabSize = 5)
    val ps = m.pieces.toMap
    assert(ps.contains("a") && ps.contains("b")) // singles always kept
    // multis by count: ab=15, aa=10, aab=10 -> top 3 of them by (cnt desc, piece asc)
    assert(ps.contains("ab") && ps.contains("aa") && ps.contains("aab"))
    assert(m.pieces.size == 5)
    // scores are ln(count/total) micro-rounded: more frequent => higher
    assert(ps("ab") > ps("aa"))
    // a appears 2*10+5=25 times > ab's 15 => higher score
    assert(ps("a") > ps("ab"))
  }

  test("save/load round-trips the model exactly") {
    val dir = java.nio.file.Files.createTempDirectory("unigram_model").toString
    UnigramTokenizer.save(spark, model, dir)
    val back = UnigramTokenizer.load(spark, dir)
    assert(back.pieces == model.pieces.sortBy(_._1) && back.maxPieceLen == 4)
    assert(back.unkMicro == model.unkMicro)
  }
}
