package graft.functions.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled n-gram tuple kernel — the language-model family's hot
  * projection, promoted from its interpreted declarative form (the
  * [[ShingleOps]] precedent, and the rung the `ngramsFromArray`
  * CodegenFallback documented).
  *
  * The declarative form (`filter(ts, t -> t <> '')` then
  * `transform(ts, (t, i) -> struct(when(i >= k, ts[i-k]).otherwise(''),
  * ..., t))`) evaluates BOTH higher-order functions interpreted
  * (CodegenFallback in Spark 4), boxing every token through the lambda
  * machinery and re-walking the array once per context column. This
  * kernel makes ONE pass: blank/null tokens drop in place, then each
  * position emits its `order`-wide BOS-padded (`""`) tuple as an
  * [[GenericInternalRow]] — inside whole-stage codegen. Output rows are
  * IDENTICAL to the declarative form (same tokens, same order, same
  * padding; NgramKernelSpec pins the parity), so every LM builder —
  * bigram KN, trigram, 4-gram — and the DuckDB oracles are unaffected.
  */
object NgramOps {

  /** One row per KEPT token position i: fields 0..order-2 are the
    * blank-filtered tokens `order-1-j` positions back (`""` before the
    * document start — BOS padding), field order-1 is the token itself.
    * Null and empty-string tokens are dropped BEFORE windowing, exactly
    * like the `filter(ts, t -> t <> '')` they replace (a null
    * predicate result drops the element too).
    */
  def ngramStructs(tokens: ArrayData, order: Int): ArrayData = {
    val n0 = tokens.numElements()
    val kept = new Array[UTF8String](n0)
    var m = 0
    var i = 0
    while (i < n0) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        if (t.numBytes() > 0) { kept(m) = t; m += 1 }
      }
      i += 1
    }
    val out = new Array[Any](m)
    i = 0
    while (i < m) {
      val fields = new Array[Any](order)
      var j = 0
      while (j < order - 1) {
        val back = order - 1 - j
        fields(j) =
          if (i >= back) kept(i - back) else UTF8String.EMPTY_UTF8
        j += 1
      }
      fields(order - 1) = kept(i)
      out(i) = new GenericInternalRow(fields)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** ngram_structs(tokens: array<string>) -> array<struct<...>>: the
  * BOS-padded n-gram tuple per kept token position, fields named by
  * `fieldNames` (context-first, e.g. p2, p1, cur). Values are never
  * null (BOS is the empty string), so the struct fields and the array
  * declare non-null.
  */
case class NgramStructs(child: Expression, order: Int,
    fieldNames: Seq[String]) extends UnaryExpression {
  require(order >= 1, "n-gram order must be >= 1")
  require(fieldNames.length == order,
    s"order-$order n-gram needs $order field names, got $fieldNames")
  override def dataType: DataType = ArrayType(
    StructType(fieldNames.map(f => StructField(f, StringType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    NgramOps.ngramStructs(v.asInstanceOf[ArrayData], order)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.NgramOps.ngramStructs($c, $order)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "ngram_structs"
}

object NgramFunctions {
  def ngramStructs(tokens: Column, order: Int, fieldNames: Seq[String]): Column =
    GraftBridge.column(NgramStructs(GraftBridge.expression(tokens), order, fieldNames))
}
