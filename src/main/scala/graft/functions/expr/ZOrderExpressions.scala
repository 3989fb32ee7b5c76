package graft.functions.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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

  /** Order-preserving 64-bit key of a string's first 8 UTF-8 bytes,
    * big-endian, sign-flipped so SIGNED long order equals unsigned byte
    * order (which for UTF-8 equals code-point order). Strings sharing an
    * 8-byte prefix collapse to one key — exactly the granularity a
    * min/max-pruned layout can exploit anyway.
    */
  def stringPrefixKey(s: UTF8String): Long = {
    val bytes = s.getBytes
    var out = 0L
    var i = 0
    while (i < 8) {
      out = (out << 8) | (if (i < bytes.length) bytes(i) & 0xffL else 0L)
      i += 1
    }
    out ^ Long.MinValue
  }
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

/** z_value_n(d1, …, dn) -> long: N-dimensional Morton interleave of
  * `bitsPer` bits per dimension; inputs pre-bucketed to [0, 2^bitsPer).
  * Null in any dimension nulls the key.
  */
case class ZValueN(children: Seq[Expression], bitsPer: Int)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(children.nonEmpty, "z-order needs at least one dimension")
  require(bitsPer >= 1 && children.size * bitsPer <= 63,
    "dims * bitsPer must fit in a non-negative long")
  override def inputTypes: Seq[DataType] = Seq.fill(children.size)(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: InternalRow): Any = {
    val arr = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v == null) return null
      arr(i) = v.asInstanceOf[Long]
      i += 1
    }
    ZOrderOps.interleave(arr, bitsPer)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zdims")
    val childCode = gens.map(_.code.toString).mkString("\n")
    val anyNull = gens.map(_.isNull).mkString(" || ")
    val assigns = gens.zipWithIndex
      .map { case (g, i) => s"$arr[$i] = ${g.value};" }.mkString("\n")
    ev.copy(code = code"""
      $childCode
      boolean ${ev.isNull} = $anyNull;
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        long[] $arr = new long[${children.size}];
        $assigns
        ${ev.value} = graft.functions.expr.ZOrderOps.interleave($arr, $bitsPer);
      }""")
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  override def prettyName: String = "z_value_n"
}

/** string_prefix_key(s) -> long: see [[ZOrderOps.stringPrefixKey]]. */
case class StringPrefixKey(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    ZOrderOps.stringPrefixKey(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.ZOrderOps.stringPrefixKey($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "string_prefix_key"
}

object ZOrderFunctions {
  def zValue(x: Column, y: Column, bitsPer: Int): Column =
    GraftBridge.column(ZValue(
      GraftBridge.expression(x), GraftBridge.expression(y), bitsPer))
  def zValueN(dims: Seq[Column], bitsPer: Int): Column =
    GraftBridge.column(ZValueN(dims.map(GraftBridge.expression), bitsPer))
  def stringPrefixKey(s: Column): Column =
    GraftBridge.column(StringPrefixKey(GraftBridge.expression(s)))
}
