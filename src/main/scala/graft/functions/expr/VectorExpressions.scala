package graft.functions.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

  def sub(a: ArrayData, b: ArrayData): ArrayData = {
    val n = math.min(a.numElements(), b.numElements())
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = a.getFloat(i) - b.getFloat(i); i += 1 }
    new GenericArrayData(out)
  }
}

/** Random-hyperplane LSH kernel: per-table sign-bit signatures computed in
  * ONE pass over the vector. The hyperplane matrices are generated
  * deterministically from (seed, table) ONCE per expression instance and
  * ride the plan as a reference object — no per-row cache lookups in the
  * kernel, and no literal-array hyperplanes (which at tables x planes x
  * dim floats bloat codegen and planning).
  */
object HyperplaneOps {
  /** planes x dim hyperplane matrix for hash table `t`, deterministic in
    * (seed, t): splitmix64 stream mapped to [-1, 1).
    */
  def planesFor(planes: Int, dim: Int, seed: Long, t: Int): Array[Array[Float]] = {
    var s = seed + 0x632be59bd9b4e019L * (t + 1)
    def next(): Long = { s += 0x9e3779b97f4a7c15L; TextHashOps.fmix64(s) }
    Array.fill(planes)(Array.fill(dim)(
      ((next() >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat))
  }

  /** One signature per hash table: bit p of sigs[t] = [dot(vec, plane_{t,p}) > 0].
    * Accumulation matches [[VectorOps.dot]] (double, left-to-right).
    * `hp` is the pre-resolved tables x planes x dim matrix stack.
    */
  def sigs(vec: ArrayData, hp: Array[Array[Array[Float]]], dim: Int): ArrayData = {
    val out = new Array[Long](hp.length)
    val n = math.min(vec.numElements(), dim)
    var t = 0
    while (t < hp.length) {
      val tbl = hp(t)
      var sig = 0L
      var p = 0
      while (p < tbl.length) {
        val row = tbl(p)
        var s = 0.0
        var i = 0
        while (i < n) { s += vec.getFloat(i).toDouble * row(i).toDouble; i += 1 }
        if (s > 0.0) sig |= 1L << p
        p += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** bucket_probes(sig) -> array<long>: the signature itself plus its
  * `planes` radius-1 bit flips — the multi-probe bucket list. A compiled
  * one-call replacement for the `transform(flips, m -> sig ^ m)` HOF,
  * which runs interpreted per (row, table) over the probed join side.
  */
object ProbeOps {
  def probes(sig: Long, planes: Int): ArrayData = {
    val out = new Array[Long](planes + 1)
    out(0) = sig
    var p = 0
    while (p < planes) { out(p + 1) = sig ^ (1L << p); p += 1 }
    new GenericArrayData(out)
  }
}

case class BucketProbes(child: Expression, planes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    ProbeOps.probes(v.asInstanceOf[Long], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.ProbeOps.probes($c, $planes)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "bucket_probes"
}

/** hyperplane_sigs(vec: array<float>) -> array<long>: the LSH signature of
  * `vec` in each of `tables` independent hash tables.
  */
case class HyperplaneSigs(child: Expression, planes: Int, tables: Int, dim: Int, seed: Long)
    extends UnaryExpression {
  @transient private lazy val hp: Array[Array[Array[Float]]] =
    Array.tabulate(tables)(t => HyperplaneOps.planesFor(planes, dim, seed, t))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    HyperplaneOps.sigs(v.asInstanceOf[ArrayData], hp, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplanes", hp, "float[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.HyperplaneOps.sigs($c, $ref, $dim)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "hyperplane_sigs"
}

/** IVF coarse-quantizer kernel: indices of the `m` centroids with the
  * highest dot product against the input vector (centroids are unit-norm,
  * so dot order == cosine order), ties broken by lower index.
  */
object IvfOps {
  def nearest(vec: ArrayData, cents: Array[Array[Float]], m: Int): ArrayData = {
    val n = cents.length
    val scores = new Array[Double](n)
    var i = 0
    while (i < n) {
      val c = cents(i)
      val lim = math.min(vec.numElements(), c.length)
      var s = 0.0
      var j = 0
      while (j < lim) { s += vec.getFloat(j).toDouble * c(j).toDouble; j += 1 }
      scores(i) = s
      i += 1
    }
    val top = Array.tabulate(n)(identity)
      .sortBy(i => (-scores(i), i)).take(math.min(m, n))
    new GenericArrayData(top)
  }
}

/** nearest_cells(vec) -> array<int>: the `nprobe` nearest of the bound
  * centroid set. The centroid matrix rides along as a plan reference
  * object (nlist x dim floats — a few KB), not as literal expressions.
  */
case class NearestCells(child: Expression, centroids: Array[Array[Float]], nprobe: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    IvfOps.nearest(v.asInstanceOf[ArrayData], centroids, nprobe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.IvfOps.nearest($c, $ref, $nprobe)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "nearest_cells"
}

/** Quantizer-drift kernel: (argmin cell, L2 distance) of a vector
  * against a bound centroid set, composed EXACTLY as
  * `sqrt(max(dot(v,v) - 2*dot(v,c) + dot(c,c), 0))` with every dot a
  * sequential double fold — the arithmetic a SQL oracle reproduces
  * verbatim from three LIST_DOT_PRODUCTs (the q24 cosine precedent), so
  * the drift audit gets a bit-exact oracle despite the learned centroids.
  * Ties pick the lower cell (strict `<`), matching the oracle's
  * MIN(cell)-at-min-distance.
  */
object DriftOps {
  def selfDot(c: Array[Float]): Double = {
    var s = 0.0
    var k = 0
    while (k < c.length) { s += c(k).toDouble * c(k).toDouble; k += 1 }
    s
  }

  def nearestDist(
      vec: ArrayData, cents: Array[Array[Float]], cc: Array[Double]):
      org.apache.spark.sql.catalyst.InternalRow = {
    val n = vec.numElements()
    var vv = 0.0
    var j = 0
    while (j < n) { val x = vec.getFloat(j).toDouble; vv += x * x; j += 1 }
    var best = 0
    var bestD2 = Double.MaxValue
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      val lim = math.min(n, c.length)
      var vc = 0.0
      var k = 0
      while (k < lim) { vc += vec.getFloat(k).toDouble * c(k).toDouble; k += 1 }
      val d2 = vv - 2.0 * vc + cc(i)
      if (d2 < bestD2) { bestD2 = d2; best = i }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(best, math.sqrt(math.max(bestD2, 0.0)))
  }
}

/** nearest_cell_dist(vec) -> struct<cell:int, dist:double> against the
  * bound centroid set (plan reference object, KB-sized). The audit-grade
  * double-precision complement of [[NearestCells]] (whose float kernel is
  * the ASSIGNMENT path): same argmin on unit-norm-trained centroids, but
  * an arithmetic contract a SQL oracle can replay bit-exactly.
  */
case class NearestCellDistance(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression {
  private lazy val cc: Array[Double] = centroids.map(DriftOps.selfDot)
  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("dist", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    DriftOps.nearestDist(v.asInstanceOf[ArrayData], centroids, cc)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refC = ctx.addReferenceObj("centroids", centroids, "float[][]")
    val refCC = ctx.addReferenceObj("cc", cc, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expr.DriftOps.nearestDist($c, $refC, $refCC)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "nearest_cell_dist"
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

/** vec_sub(a, b) -> array<float>: element-wise difference, length = the
  * shorter input. The residual-coding kernel (IVF+PQ `by_residual`):
  * corpus-sized encode passes must stay inside whole-stage codegen — a
  * `zip_with` lambda is CodegenFallback in Spark 4 (interpreted per
  * element).
  */
case class VectorSub(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.sub(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.expr.VectorOps.sub($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "vec_sub"
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
  def vecSub(a: Column, b: Column): Column =
    GraftBridge.column(VectorSub(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  def hyperplaneSigs(vec: Column, planes: Int, tables: Int, dim: Int, seed: Long): Column =
    GraftBridge.column(HyperplaneSigs(
      GraftBridge.expression(vec), planes, tables, dim, seed))
  def nearestCells(vec: Column, centroids: Array[Array[Float]], nprobe: Int): Column =
    GraftBridge.column(NearestCells(
      GraftBridge.expression(vec), centroids, nprobe))
  def nearestCellDistance(vec: Column, centroids: Array[Array[Float]]): Column =
    GraftBridge.column(NearestCellDistance(
      GraftBridge.expression(vec), centroids))
  def bucketProbes(sig: Column, planes: Int): Column =
    GraftBridge.column(BucketProbes(GraftBridge.expression(sig), planes))
}
