package graft.functions.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Bpe

/** Row kernels for the BPE expressions — static entry points the
  * generated code calls ([[graft.functions.expr.TextHashOps]] pattern).
  */
object BpeOps {
  /** Greedy (rank, leftmost) merge loop over one word; the merge table
    * arrives as a plan reference object, so the per-row work is pure
    * in-memory symbol surgery — no join, no shuffle.
    */
  def encode(word: UTF8String, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val pieces = Bpe.encode(word.toString, ranks)
    new GenericArrayData(pieces.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  /** pieces -> vocabulary ids; 0 is the documented OOV fallback. */
  def ids(pieces: ArrayData, vocab: java.util.HashMap[String, java.lang.Long]): ArrayData = {
    val n = pieces.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val id = vocab.get(pieces.getUTF8String(i).toString)
      out(i) = if (id == null) 0L else id.longValue()
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** bpe_encode(word: string) -> array<string> pieces, with the learned
  * merge-rank table riding the plan as a reference object.
  */
case class BpeEncode(child: Expression, ranks: java.util.HashMap[String, Integer])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    BpeOps.encode(v.asInstanceOf[UTF8String], ranks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.BpeOps.encode($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "bpe_encode"
}

/** bpe_ids(pieces: array<string>) -> array<long> vocabulary ids (0 = OOV). */
case class BpeIds(child: Expression, vocab: java.util.HashMap[String, java.lang.Long])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    BpeOps.ids(v.asInstanceOf[ArrayData], vocab)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeVocab", vocab, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.BpeOps.ids($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "bpe_ids"
}

/** Column-API entry points. */
object BpeFunctions {
  def bpeEncode(word: Column, model: Bpe.Model): Column =
    GraftBridge.column(BpeEncode(GraftBridge.expression(word), model.ranks))
  def bpeIds(pieces: Column, model: Bpe.Model): Column =
    GraftBridge.column(BpeIds(GraftBridge.expression(pieces), model.ids))
}
