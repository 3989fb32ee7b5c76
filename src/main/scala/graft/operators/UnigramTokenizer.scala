package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenization (the SentencePiece family, Kudo
  * 2018 shape): a vocabulary of PIECES with log-probabilities, applied
  * by VITERBI — each word segments into the piece sequence maximizing
  * the summed log-probability. The third rung of the tokenizer family
  * beside q55's vocab lookup and q111/q121's BPE: where BPE composes a
  * word bottom-up through learned merges, the unigram model picks the
  * globally best segmentation from scored candidates (and is what the
  * Llama/T5-class pipelines run via SentencePiece).
  *
  * Deterministic stand-in for the EM step: SentencePiece seeds its
  * vocabulary with frequent substrings and EM-prunes; here the model IS
  * the frequency-derived seed — every single codepoint (coverage
  * guarantee, as SentencePiece keeps all characters) plus the top
  * `vocabSize − |chars|` substrings of length 2..`maxPieceLen` by
  * (count DESC, piece ASC), scored ln(count/total) in INTEGER
  * micro-nats so the Viterbi argmax is bit-reproducible cross-engine
  * (the q120/q118 integer-micro discipline; floats only inside the
  * one driver-side `ln` whose rounded value becomes the model).
  *
  * Scale shape: training is substring-explode (bounded ×L per char) →
  * one map-side-combined count aggregate → top-V `orderBy/limit` in
  * the engine; only the V chosen rows reach the driver (codebook-sized
  * by contract, the Bpe/Ivf pattern). Application is a compiled
  * per-word kernel ([[graft.functions.expr.UnigramSegment]]) with the
  * score table riding the plan as a reference object — no join, no
  * shuffle, O(len · maxPieceLen) per word, and it runs per DISTINCT
  * word, not per occurrence.
  *
  * Tie rule (pinned, oracle-replayed): among equal-score predecessors
  * the LARGEST split point wins — the shortest final piece. The DuckDB
  * twin encodes it arithmetically as max((v + SHIFT)·64 + j), which is
  * why segmented words are capped at [[maxWordLen]] < 64 codepoints.
  */
object UnigramTokenizer {

  /** Words longer than this many codepoints are excluded from
    * segmentation (and from training) — SentencePiece's
    * max_sentencepiece_length cousin, and the bound that keeps the
    * oracle's ×64 tie-break encoding collision-free.
    */
  val maxWordLen = 32

  /** A learned model: `pieces` as (piece, scoreMicro) with scoreMicro =
    * round(1e6 · ln(count/total)); unknown single codepoints score
    * [[Model.unkMicro]] (1 micro-nat-million below the worst piece) so
    * the kernel is total without ever beating a real piece.
    */
  final case class Model(pieces: Seq[(String, Long)], maxPieceLen: Int) {
    require(pieces.nonEmpty, "empty unigram vocabulary")
    lazy val scores: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long]()
      pieces.foreach { case (p, sc) => m.put(p, sc) }
      m
    }
    lazy val unkMicro: Long = pieces.map(_._2).min - 1000000L
  }

  /** Learn a model from a (word, freq) table. Distributed up to the
    * top-V selection: substrings of length 1..`maxPieceLen` explode per
    * word (weighted by corpus frequency), counts aggregate map-side,
    * singles are ALL kept (coverage), multis keep count >= `minCount`
    * and the top `vocabSize − |singles|` by (count DESC, piece ASC).
    * Only those rows are collected.
    */
  def train(wordFreqs: DataFrame, maxPieceLen: Int = 4, minCount: Long = 2,
      vocabSize: Int = 256): Model = {
    val wf = wordFreqs.toDF("w", "f")
      .filter(col("w") =!= "" && length(col("w")) <= maxWordLen)
    val counts = wf
      .select(col("w"), col("f"), explode(sequence(lit(1), length(col("w")))).as("i"))
      .select(col("w"), col("f"), col("i"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("w")) - col("i") + 1))).as("l"))
      .selectExpr("substring(w, i, l) AS p", "f")
      .groupBy("p").agg(sum("f").as("cnt"))

    val singles = counts.filter(length(col("p")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(singles.length < vocabSize,
      s"vocabSize $vocabSize must exceed the ${singles.length} single codepoints")
    val multis = counts.filter(length(col("p")) > 1 && col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("p").asc)
      .limit(vocabSize - singles.length)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    val kept = (singles ++ multis).sortBy(_._1)
    val total = kept.map(_._2).sum.toDouble
    Model(
      kept.map { case (p, c) => (p, math.round(1e6 * math.log(c / total))) },
      maxPieceLen)
  }

  /** Viterbi-segment one word (reference implementation; the compiled
    * kernel [[graft.functions.expr.UnigramOps.segment]] must agree
    * element-for-element — spec-pinned). Returns (scoreMicro, pieces).
    */
  def segment(word: String, model: Model): (Long, Seq[String]) = {
    val cps = Bpe.codepoints(word)
    val n = cps.length
    require(n <= maxWordLen, s"word longer than $maxWordLen codepoints: $word")
    if (n == 0) return (0L, Nil)
    val v = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var best = Long.MinValue
      var bestJ = -1
      var j = i - 1
      val lo = math.max(0, i - model.maxPieceLen)
      while (j >= lo) {
        val piece = cps.slice(j, i).mkString
        val sc: java.lang.Long =
          if (i - j == 1) {
            val s = model.scores.get(piece)
            if (s == null) java.lang.Long.valueOf(model.unkMicro) else s
          } else model.scores.get(piece)
        if (sc != null) {
          val cand = v(j) + sc.longValue()
          if (cand > best) { best = cand; bestJ = j } // strict: largest j wins ties
        }
        j -= 1
      }
      v(i) = best; back(i) = bestJ
      i += 1
    }
    val out = mutable.ListBuffer[String]()
    var p = n
    while (p > 0) {
      out.prepend(cps.slice(back(p), p).mkString)
      p = back(p)
    }
    (v(n), out.toList)
  }

  /** Persist (piece, score) rows + meta (`meta` last — its `_SUCCESS`
    * is the completion marker, the [[Bpe.save]] contract).
    */
  def save(spark: SparkSession, model: Model, dir: String): Unit = {
    import spark.implicits._
    model.pieces.toDF("p", "score_micro")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/pieces")
    Seq((model.pieces.size, model.maxPieceLen)).toDF("n_pieces", "max_piece_len")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  def load(spark: SparkSession, dir: String): Model = {
    val maxLen = spark.read.parquet(s"$dir/meta").collect()(0).getAs[Int]("max_piece_len")
    val pieces = spark.read.parquet(s"$dir/pieces").collect()
      .map(r => (r.getAs[String]("p"), r.getAs[Long]("score_micro")))
      .sortBy(_._1).toSeq
    Model(pieces, maxLen)
  }
}
