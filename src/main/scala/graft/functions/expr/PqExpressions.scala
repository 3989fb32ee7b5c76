package graft.functions.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou/Douze/Schmid, TPAMI 2011) —
  * static methods for codegen, same contract as [[VectorOps]]:
  * double-precision left-to-right accumulation, no per-row allocation
  * beyond the result.
  */
object PqOps {

  /** Index of the L2-nearest centroid for a (sub)vector. argmin ||x-c||²
    * computed directly (not via the dot-product shortcut) so it is
    * correct for UN-normalized subvectors — a PQ subspace slice of a
    * unit vector is not itself unit.
    */
  def nearestL2(vec: ArrayData, cents: Array[Array[Float]], offset: Int): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      var d = 0.0
      var j = 0
      while (j < c.length) {
        val diff = vec.getFloat(offset + j).toDouble - c(j).toDouble
        d += diff * diff
        j += 1
      }
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** PQ encode: per subspace j of width dsub, the L2-nearest code in
    * codebook j. Returns array<int> of length m.
    */
  def encode(vec: ArrayData, books: Array[Array[Array[Float]]], dsub: Int): ArrayData = {
    val m = books.length
    val out = new Array[Int](m)
    var j = 0
    while (j < m) { out(j) = nearestL2(vec, books(j), j * dsub); j += 1 }
    new GenericArrayData(out)
  }

  /** ADC lookup table for ONE query: flattened m x ksub inner products
    * of the query's subspace slices against every codebook entry —
    * table[j*ksub + k] = dot(q_j, books[j][k]). Search-time scoring is
    * then m array lookups per corpus CODE row; the query's float vector
    * never meets corpus data.
    */
  def adcTable(vec: ArrayData, books: Array[Array[Array[Float]]], dsub: Int): ArrayData = {
    val m = books.length
    val ksub = if (m == 0) 0 else books(0).length
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      val book = books(j)
      var k = 0
      while (k < ksub) {
        val c = book(k)
        var s = 0.0
        var d = 0
        while (d < c.length) { s += vec.getFloat(j * dsub + d).toDouble * c(d).toDouble; d += 1 }
        out(j * ksub + k) = s
        k += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Approximate inner product of a query (via its ADC table) and a
    * corpus vector (via its codes): Σ_j table[j*ksub + codes[j]].
    */
  def adcScore(codes: ArrayData, table: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    var s = 0.0
    var j = 0
    while (j < m) { s += table.getDouble(j * ksub + codes.getInt(j)); j += 1 }
    s
  }
}

/** pq_encode(vec) -> array<int>: the m L2-nearest subspace codes. The
  * codebooks ride the plan as a reference object (m x ksub x dsub
  * floats — KBs), as in [[NearestCells]].
  */
case class PqEncode(child: Expression, books: Array[Array[Array[Float]]], dsub: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    PqOps.encode(v.asInstanceOf[ArrayData], books, dsub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("books", books, "float[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.PqOps.encode($c, $ref, $dsub)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "pq_encode"
}

/** pq_adc_table(qvec) -> array<double>: the query's flattened m x ksub
  * subspace-inner-product table.
  */
case class PqAdcTable(child: Expression, books: Array[Array[Array[Float]]], dsub: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    PqOps.adcTable(v.asInstanceOf[ArrayData], books, dsub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("books", books, "float[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.PqOps.adcTable($c, $ref, $dsub)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "pq_adc_table"
}

/** pq_adc_score(codes, table) -> double: Σ_j table[j*ksub + codes[j]]. */
case class PqAdcScore(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    PqOps.adcScore(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], ksub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.expr.PqOps.adcScore($a, $b, $ksub)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "pq_adc_score"
}

/** Column-API entry points. */
object PqFunctions {
  def pqEncode(vec: Column, books: Array[Array[Array[Float]]], dsub: Int): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(vec), books, dsub))
  def pqAdcTable(vec: Column, books: Array[Array[Array[Float]]], dsub: Int): Column =
    GraftBridge.column(PqAdcTable(GraftBridge.expression(vec), books, dsub))
  def pqAdcScore(codes: Column, table: Column, ksub: Int): Column =
    GraftBridge.column(PqAdcScore(
      GraftBridge.expression(codes), GraftBridge.expression(table), ksub))
}
