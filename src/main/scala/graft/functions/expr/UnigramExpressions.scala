package graft.functions.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.UnigramTokenizer

/** Row kernel for the unigram-LM Viterbi segmenter — the static entry
  * point the generated code calls ([[BpeOps]] pattern). The DP is the
  * reference rule of [[UnigramTokenizer.segment]] (spec-pinned equal);
  * re-implemented here over the codepoint array without intermediate
  * collections so the per-row cost is O(len · maxPieceLen) lookups.
  */
object UnigramOps {
  def segment(word: UTF8String,
      scores: java.util.HashMap[String, java.lang.Long],
      unkMicro: Long, maxPieceLen: Int): InternalRow = {
    val cps = graft.operators.Bpe.codepoints(word.toString)
    val n = cps.length
    if (n == 0 || n > UnigramTokenizer.maxWordLen)
      return new GenericInternalRow(Array[Any](0L, 0, UTF8String.EMPTY_UTF8))
    val v = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var best = Long.MinValue
      var bestJ = -1
      var j = i - 1
      val lo = if (i - maxPieceLen > 0) i - maxPieceLen else 0
      while (j >= lo) {
        val sb = new java.lang.StringBuilder()
        var k = j
        while (k < i) { sb.append(cps(k)); k += 1 }
        val sc0 = scores.get(sb.toString)
        val sc: java.lang.Long =
          if (sc0 == null && i - j == 1) java.lang.Long.valueOf(unkMicro) else sc0
        if (sc != null) {
          val cand = v(j) + sc.longValue()
          if (cand > best) { best = cand; bestJ = j } // strict: largest j wins ties
        }
        j -= 1
      }
      v(i) = best; back(i) = bestJ
      i += 1
    }
    var np = 0
    var p = n
    while (p > 0) { np += 1; p = back(p) }
    val segs = new Array[String](np)
    p = n
    var s = np - 1
    while (p > 0) {
      val sb = new java.lang.StringBuilder()
      var k = back(p)
      while (k < p) { sb.append(cps(k)); k += 1 }
      segs(s) = sb.toString
      s -= 1; p = back(p)
    }
    new GenericInternalRow(Array[Any](
      v(n), np, UTF8String.fromString(segs.mkString(" "))))
  }
}

/** unigram_segment(word) -> struct(score_micro, n_pieces, seg), with
  * the learned score table riding the plan as a reference object.
  */
case class UnigramSegment(child: Expression,
    scores: java.util.HashMap[String, java.lang.Long],
    unkMicro: Long, maxPieceLen: Int) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("score_micro", LongType, nullable = false),
    StructField("n_pieces", IntegerType, nullable = false),
    StructField("seg", StringType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    UnigramOps.segment(v.asInstanceOf[UTF8String], scores, unkMicro, maxPieceLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramScores", scores, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expr.UnigramOps.segment($c, $ref, ${unkMicro}L, $maxPieceLen)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "unigram_segment"
}

/** Column-API entry point. */
object UnigramFunctions {
  def unigramSegment(word: Column, model: UnigramTokenizer.Model): Column =
    GraftBridge.column(UnigramSegment(GraftBridge.expression(word),
      model.scores, model.unkMicro, model.maxPieceLen))
}
