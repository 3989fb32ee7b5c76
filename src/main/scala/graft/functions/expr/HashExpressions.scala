package graft.functions.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static text-hashing kernels for the dedup/fingerprint expressions.
  *
  * Algorithms are standard public constructions: FNV-1a 64 over UTF-8
  * bytes with a murmur-style fmix64 finalizer (avalanche), SimHash
  * (Charikar 2002), MinHash with k universal-hash derivations, and a
  * polynomial rolling hash with winnowing-style min selection
  * (Schleimer/Wilkerson/Aiken 2003).
  */
object TextHashOps {
  /** murmur3 fmix64 finalizer — full avalanche over a 64-bit state. */
  def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** 64-bit FNV-1a over UTF-8 bytes + fmix64. Deterministic everywhere. */
  def hash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    fmix64(h)
  }

  /** SimHash-64 over a token array: per-bit vote of token hashes. */
  def simhash(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hash64(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** k-signature MinHash: h_i(x) = fmix64(hash64(x) ^ seed_i), min over
    * the shingle set per i. seed_i derived from `seed` via splitmix64.
    */
  def minhash(shingles: ArrayData, k: Int, seed: Long): ArrayData = {
    val seeds = new Array[Long](k)
    var s = seed
    var i = 0
    while (i < k) { s += 0x9e3779b97f4a7c15L; seeds(i) = fmix64(s); i += 1 }
    val mins = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var j = 0
    while (j < n) {
      if (!shingles.isNullAt(j)) {
        val base = hash64(shingles.getUTF8String(j))
        i = 0
        while (i < k) {
          val h = fmix64(base ^ seeds(i))
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** Winnowing fingerprint: polynomial rolling hash over each `window`
    * consecutive tokens, then the MINIMUM window hash as the document
    * fingerprint (robust to local edits away from the minimum).
    */
  def rollingFingerprint(tokens: ArrayData, window: Int): Long = {
    val n = tokens.numElements()
    if (n == 0) return 0L
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = if (tokens.isNullAt(i)) 0L else hash64(tokens.getUTF8String(i))
      i += 1
    }
    val w = math.min(window, n)
    val B = 0x100000001b3L
    // Bw = B^(w-1) for the rolling update
    var bw = 1L
    i = 1
    while (i < w) { bw *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * B + hs(i); i += 1 }
    var min = h
    i = w
    while (i < n) {
      h = (h - hs(i - w) * bw) * B + hs(i)
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Element-wise xxhash64 (seed 42 — the SQL builtin's single-string
    * form, same as [[ShingleOps.shingleWindowHashes]]'s per-window hash)
    * over a string array, one kernel call per row. Null elements (never
    * produced by the shingle kernels) hash to 0L so the output array
    * stays containsNull = false.
    */
  def xxhash64Array(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) 0L
        else org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(arr.getUTF8String(i), 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** splitmix64 step — the same derivation [[minhash]] uses for its
    * per-signature seeds, exposed for other fixed parameter families.
    */
  def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Count-Min row buckets for one item: bucket_i = low logW bits of
    * (hash64(item) * A_i + B_i) mod 2^64 — a multiply-shift universal
    * hash per row over the shared avalanched base hash. Arithmetic-only
    * (wrapping 64-bit multiply/add, power-of-two width), so a SQL oracle
    * replays it exactly via the HUGEINT mod-2^64 chain.
    */
  def cmsBuckets(s: UTF8String, d: Int, logW: Int): ArrayData = {
    val x = hash64(s)
    val mask = (1L << logW) - 1L
    val out = new Array[Int](d)
    var i = 0
    while (i < d) {
      out(i) = ((x * CmsParams.A(i) + CmsParams.B(i)) & mask).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All-d-positions-set membership test against a packed bit set (see
    * [[graft.functions.expr.BloomContains]]).
    */
  def bloomContains(s: UTF8String, bits: Array[Long], d: Int, logW: Int): Boolean = {
    val x = hash64(s)
    val mask = (1L << logW) - 1L
    var i = 0
    while (i < d) {
      val pos = ((x * CmsParams.A(i) + CmsParams.B(i)) & mask).toInt
      if ((bits(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Fixed per-row multipliers/offsets for the Count-Min sketch rows —
  * splitmix64-derived, odd multipliers. Shared by the compiled
  * [[CmsBuckets]] kernel and the DuckDB oracle generator (which splices
  * the same values as HUGEINT literals), so both sides hash identically.
  */
object CmsParams {
  val maxRows = 8
  val A: Array[Long] =
    Array.tabulate(maxRows)(i => TextHashOps.splitmix64(0x5eedL + i) | 1L)
  val B: Array[Long] =
    Array.tabulate(maxRows)(i => TextHashOps.splitmix64(0xb00b5L + i))

  /** A(i)/B(i) as unsigned decimal strings for SQL literal splicing. */
  def aU(i: Int): String = java.lang.Long.toUnsignedString(A(i))
  def bU(i: Int): String = java.lang.Long.toUnsignedString(B(i))
}

/** simhash64(tokens: array<string>) -> long */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = TextHashOps.simhash(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.TextHashOps.simhash($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** minhash_sig(shingles: array<string>) -> array<long> of length k. */
case class MinHashSignature(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextHashOps.minhash(v.asInstanceOf[ArrayData], k, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.TextHashOps.minhash($c, $k, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** xxhash64_array(arr: array<string>) -> array<long>: element-wise
  * `xxhash64` (seed 42 — bit-identical to the SQL builtin on a single
  * string argument, the [[ShingleOps.shingleWindowHashes]] precedent).
  * Exists so the dedup verification-key derivation is a per-row ARRAY MAP
  * inside whole-stage codegen: the previous explode + groupBy +
  * collect_list formulation re-shuffled every shingle key by doc id on
  * every index build AND every incremental probe batch — an id-keyed
  * exchange of the entire key population that carried zero information
  * (the keys were already grouped by row before the explode).
  */
case class XxHash64Array(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextHashOps.xxhash64Array(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.TextHashOps.xxhash64Array($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "xxhash64_array"
}

/** rolling_fingerprint(tokens: array<string>) -> long (winnowing min). */
case class RollingFingerprint(child: Expression, window: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextHashOps.rollingFingerprint(v.asInstanceOf[ArrayData], window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.TextHashOps.rollingFingerprint($c, $window)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "rolling_fingerprint"
}

/** hash64(s: string) -> long — the engine's FNV-1a+fmix64 scalar,
  * exposed directly for sketch bucket derivations (CMS rows, HLL
  * registers). Deterministic across JVMs and bit-replayable in SQL.
  */
case class Hash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextHashOps.hash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.TextHashOps.hash64($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "hash64"
}

/** cms_buckets(item: string) -> array<int> of length d: the item's
  * Count-Min bucket per sketch row (see [[TextHashOps.cmsBuckets]]).
  */
case class CmsBuckets(child: Expression, d: Int, logW: Int)
    extends UnaryExpression {
  require(d >= 1 && d <= CmsParams.maxRows, s"d must be in [1, ${CmsParams.maxRows}], got $d")
  require(logW >= 1 && logW <= 30, s"logW must be in [1, 30], got $logW")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextHashOps.cmsBuckets(v.asInstanceOf[UTF8String], d, logW)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.TextHashOps.cmsBuckets($c, $d, $logW)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "cms_buckets"
}

/** bloom_contains(item: string) -> boolean against a bound packed bit
  * set: true iff ALL d of the item's CMS-row probe positions
  * ([[TextHashOps.cmsBuckets]] — the same multiply-shift family) are
  * set. The bit set rides the plan as a reference object (2^logW bits =
  * 8 KB at logW 16), so the membership test is map-side with NO join or
  * shuffle — the Bloom-gate deployment shape.
  */
case class BloomContains(child: Expression, bits: Array[Long], d: Int, logW: Int)
    extends UnaryExpression {
  require(bits.length == (1 << logW) / 64,
    s"bit set must pack 2^$logW bits into ${(1 << logW) / 64} longs, got ${bits.length}")
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextHashOps.bloomContains(v.asInstanceOf[UTF8String], bits, d, logW)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.TextHashOps.bloomContains($c, $ref, $d, $logW)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "bloom_contains"
}

/** nlz64(x: long) -> int — number of leading zero bits (0..64). The HLL
  * register rank needs an INTEGER-exact leading-zero count; the
  * double-log route (`floor(log2(x))`) is libm-dependent in its last ulp
  * and therefore not oracle-safe.
  */
case class LeadingZeros64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    java.lang.Long.numberOfLeadingZeros(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Long.numberOfLeadingZeros($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "nlz64"
}

/** Column-API entry points for the hash expressions. */
object HashFunctions {
  def hash64(s: Column): Column =
    GraftBridge.column(Hash64(GraftBridge.expression(s)))
  def cmsBuckets(item: Column, d: Int, logW: Int): Column =
    GraftBridge.column(CmsBuckets(GraftBridge.expression(item), d, logW))
  def bloomContains(item: Column, bits: Array[Long], d: Int, logW: Int): Column =
    GraftBridge.column(BloomContains(GraftBridge.expression(item), bits, d, logW))
  def nlz64(x: Column): Column =
    GraftBridge.column(LeadingZeros64(GraftBridge.expression(x)))
  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens)))
  def minhashSignature(shingles: Column, k: Int = 128, seed: Long = 42L): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(shingles), k, seed))
  def rollingFingerprint(tokens: Column, window: Int = 5): Column =
    GraftBridge.column(RollingFingerprint(GraftBridge.expression(tokens), window))
  def xxhash64Array(arr: Column): Column =
    GraftBridge.column(XxHash64Array(GraftBridge.expression(arr)))
}
