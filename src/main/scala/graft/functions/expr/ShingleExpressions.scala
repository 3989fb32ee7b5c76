package graft.functions.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram shingle kernel — the single most expensive
  * expression of the dedup family, compiled.
  *
  * The declarative form (`transform(sequence(...), i -> array_join(
  * slice(tokens, i, n), ' '))` + `array_distinct`) runs as interpreted
  * CodegenFallback higher-order functions: per shingle it materializes a
  * slice, joins it, and boxes through the HOF lambda machinery, then
  * array_distinct re-walks the result. This kernel makes ONE pass over
  * the token array, emitting each shingle as a single `UTF8String.concat`
  * into a hash set, inside whole-stage codegen. Output ELEMENTS are
  * identical (space-joined n-grams, first-occurrence order) so every
  * downstream consumer — explode/xxhash inverted index, minhash
  * signatures, Jaccard verification, the DuckDB `t[i] || ' ' || ...`
  * oracle — is unaffected.
  */
object ShingleOps {
  private val SPACE = UTF8String.fromString(" ")

  def shingleSet(tokens: ArrayData, n: Int): ArrayData = {
    val count = tokens.numElements() - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](2 * n - 1)
    var j = 0
    while (j < n - 1) { parts(2 * j + 1) = SPACE; j += 1 }
    var i = 0
    while (i < count) {
      var k = 0
      var hasNull = false
      while (k < n) {
        if (tokens.isNullAt(i + k)) hasNull = true
        else parts(2 * k) = tokens.getUTF8String(i + k)
        k += 1
      }
      // a null token would make UTF8String.concat return null, planting a
      // null element in an array whose type declares containsNull = false
      // — skip windows containing one (split() never produces null tokens,
      // but the kernel must be safe for any array<string> input)
      if (!hasNull) seen.add(UTF8String.concat(parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** Ordered per-window xxhash64 (seed 42, matching the `xxhash64` SQL
    * function on the joined gram string): element i is the hash of the
    * n-token window starting at token i, so `posexplode` recovers (token
    * position, window hash) — the shape the repeated-span operator needs.
    * Windows containing a null token yield a null element (positions must
    * not shift; callers filter). Hashing in-kernel means the gram string
    * is concatenated, hashed, and dropped in one pass — it never
    * materializes into the row.
    */
  def shingleWindowHashes(tokens: ArrayData, n: Int): ArrayData = {
    val count = tokens.numElements() - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val parts = new Array[UTF8String](2 * n - 1)
    var j = 0
    while (j < n - 1) { parts(2 * j + 1) = SPACE; j += 1 }
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      var k = 0
      var hasNull = false
      while (k < n) {
        if (tokens.isNullAt(i + k)) hasNull = true
        else parts(2 * k) = tokens.getUTF8String(i + k)
        k += 1
      }
      if (!hasNull) {
        out(i) = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(UTF8String.concat(parts: _*), 42L)
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** shingle_set(tokens: array<string>) -> array<string>: distinct
  * space-joined n-grams, first-occurrence order.
  */
case class ShingleSet(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    ShingleOps.shingleSet(v.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.ShingleOps.shingleSet($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "shingle_set"
}

/** shingle_window_hashes(tokens: array<string>) -> array<long>: ordered
  * per-window xxhash64(seed 42) of each n-gram, null element where the
  * window contains a null token.
  */
case class ShingleWindowHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    ShingleOps.shingleWindowHashes(v.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.ShingleOps.shingleWindowHashes($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "shingle_window_hashes"
}

object ShingleFunctions {
  def shingleSet(tokens: Column, n: Int): Column =
    GraftBridge.column(ShingleSet(GraftBridge.expression(tokens), n))

  def shingleWindowHashes(tokens: Column, n: Int): Column =
    GraftBridge.column(ShingleWindowHashes(GraftBridge.expression(tokens), n))
}
