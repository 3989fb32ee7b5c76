package graft.functions.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) curve value — the multi-dimensional clustering key
  * behind two-column data skipping: rows sorted by the interleaved bits
  * of bucketed dimensions land in files whose min/max ranges are narrow
  * in EVERY dimension, so predicates on any of them prune files (a 1-D
  * sort prunes only its leading column). The technique behind lakehouse
  * OPTIMIZE/ZORDER, here as a compiled kernel over pre-bucketed
  * non-negative dimension values; [[graft.sources.Layout]] wires it to a
  * clustered parquet write and LayoutSpec proves the two-column pruning.
  */
object ZOrderOps {
  /** MSB-first round-robin interleave of the low `bitsPer` bits of each
    * value; result width = bitsPer * vals.length (<= 63).
    */
  def interleave(vals: Array[Long], bitsPer: Int): Long = {
    var out = 0L
    var b = bitsPer - 1
    while (b >= 0) {
      var j = 0
      while (j < vals.length) {
        out = (out << 1) | ((vals(j) >>> b) & 1L)
        j += 1
      }
      b -= 1
    }
    out
  }

  def interleave2(x: Long, y: Long, bitsPer: Int): Long =
    interleave(Array(x, y), bitsPer)
}

/** z_value(x, y) -> long: 2-D Morton interleave of `bitsPer` bits per
  * dimension; inputs pre-bucketed to [0, 2^bitsPer).
  */
case class ZValue(left: Expression, right: Expression, bitsPer: Int)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(bitsPer >= 1 && 2 * bitsPer <= 63,
    "2 * bitsPer must fit in a non-negative long")
  // declared input types make the analyzer insert casts (or fail) for
  // non-long children — without them an int child works under codegen
  // (Java widening) but ClassCastExceptions on the interpreted path
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderOps.interleave2(a.asInstanceOf[Long], b.asInstanceOf[Long], bitsPer)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.expr.ZOrderOps.interleave2($a, $b, $bitsPer)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "z_value"
}

object ZOrderFunctions {
  def zValue(x: Column, y: Column, bitsPer: Int): Column =
    GraftBridge.column(ZValue(
      GraftBridge.expression(x), GraftBridge.expression(y), bitsPer))
}
