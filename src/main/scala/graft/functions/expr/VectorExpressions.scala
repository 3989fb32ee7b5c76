package graft.functions.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static vector kernels shared by interpreted eval and generated code.
  *
  * All arithmetic is double-precision, accumulated strictly left-to-right,
  * so results are bit-reproducible across runs/partitions and match any
  * engine using the same sequential fold (the DuckDB oracle does).
  *
  * JVM-visible static methods: whole-stage codegen emits direct calls to
  * these, keeping the expressions inside the codegen'd stage (no
  * CodegenFallback, no boxing per element).
  */
object VectorOps {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def norm(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val v = a.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val na = norm(a); val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 0.0 else dot(a, b) / (na * nb)
  }
}

/** Base for binary float-vector -> double expressions with static-call
  * codegen. Spark lacks native vector similarity kernels; higher-order
  * `aggregate`/`zip_with` equivalents run interpreted per element, which
  * is the hot path of ANN/near-dup at 100 TB — hence a custom Expression
  * (SURVEY §7.5, preference (b)).
  */
abstract class FloatVectorBinary extends BinaryExpression {
  // NOTE: this base class must keep a no-arg constructor — Spark ships
  // expression trees to executors with Java serialization, and the nearest
  // non-Serializable superclass of the case classes below must be
  // no-arg-constructible.
  protected def kernelName: String

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    evalVec(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  protected def evalVec(a: ArrayData, b: ArrayData): Double

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.expr.VectorOps.$kernelName($a, $b)")
}

/** cosine(a, b) over array<float> columns. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends FloatVectorBinary {
  override protected def kernelName: String = "cosine"
  override protected def evalVec(a: ArrayData, b: ArrayData): Double = VectorOps.cosine(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** dot(a, b) over array<float> columns. */
case class DotProduct(left: Expression, right: Expression)
    extends FloatVectorBinary {
  override protected def kernelName: String = "dot"
  override protected def evalVec(a: ArrayData, b: ArrayData): Double = VectorOps.dot(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

/** Column-API entry points. */
object VectorFunctions {
  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  def dotProduct(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
