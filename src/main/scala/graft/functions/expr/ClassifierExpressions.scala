package graft.functions.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashed char-n-gram feature kernel for the linear quality classifier
  * ([[graft.operators.QualityClassifier]]) — the fastText feature shape
  * (Joulin et al. 2017): every character n-gram of the normalized text
  * hashes into a fixed `dim`-bucket space; the classifier consumes
  * bucket-count features, so the GRAM STRINGS never materialize — this
  * kernel emits the bucket of each gram in one pass over the UTF-8
  * bytes, inside whole-stage codegen.
  *
  * Windows are CODEPOINT windows (DuckDB `SUBSTR` semantics, so the
  * generated oracle extracts byte-identical grams); the hash is the
  * engine's arithmetic-only FNV-1a64+fmix64 ([[TextHashOps.hash64]])
  * over the gram's UTF-8 bytes, which is what lets the whole feature
  * derivation replay bit-exactly through the shared HUGEINT oracle
  * chain ([[graft.queries.HashOracleSql]]). `dim` must be a power of
  * two: the bucket is the hash's low log2(dim) bits, identical for the
  * signed (engine) and unsigned (oracle) reinterpretations.
  */
object ClassifierOps {

  def charGramBuckets(s: UTF8String, n: Int, dim: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // codepoint start offsets (UTF-8 continuation bytes are 10xxxxxx)
    var count = 0
    var i = 0
    while (i < len) { if ((bytes(i) & 0xc0) != 0x80) count += 1; i += 1 }
    val nGrams = count - n + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](count + 1)
    var c = 0
    i = 0
    while (i < len) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(count) = len
    val mask = (dim - 1).toLong
    val out = new Array[Any](nGrams)
    var g = 0
    while (g < nGrams) {
      var h = 0xcbf29ce484222325L
      var j = starts(g)
      val end = starts(g + n)
      while (j < end) { h ^= (bytes(j) & 0xffL); h *= 0x100000001b3L; j += 1 }
      out(g) = (TextHashOps.fmix64(h) & mask).toInt
      g += 1
    }
    new GenericArrayData(out)
  }
}

/** char_gram_buckets(text) -> array<int>: hashed bucket of every char
  * n-gram, in order; empty array when the text has fewer than n
  * codepoints.
  */
case class CharGramBuckets(child: Expression, n: Int, dim: Int)
    extends UnaryExpression {
  require(n >= 1, "gram width must be >= 1")
  require(dim > 0 && (dim & (dim - 1)) == 0, "dim must be a power of two")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    ClassifierOps.charGramBuckets(v.asInstanceOf[UTF8String], n, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.ClassifierOps.charGramBuckets($c, $n, $dim)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "char_gram_buckets"
}

object ClassifierFunctions {
  def charGramBuckets(text: Column, n: Int, dim: Int): Column =
    GraftBridge.column(CharGramBuckets(GraftBridge.expression(text), n, dim))
}
