package graft.functions.expr

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded DISTINCT-min-k buffer: the k lexicographically-smallest
  * DISTINCT string values seen — the KMV (k-minimum-values) sketch
  * state. [[MinKStringBuffer]] keeps duplicates (bottom-k of a
  * multiset, the right semantics for a row sample); a KMV distinct
  * sketch must collapse them, or a heavy value would occupy several of
  * the k slots and bias the threshold hash upward.
  *
  * A sorted set capped at k: insert skips known values, evicts the
  * current maximum when full. Update and merge are O(log k); the
  * serialized form is bounded by the k retained strings. Like the
  * bottom-k sample, membership is a pure function of the input SET —
  * duplicates, partitioning, and merge order are invisible — which is
  * what lets the whole sketch replay bit-exactly in SQL.
  *
  * ORDERING CONTRACT: Java `String` lexicographic order (UTF-16 code
  * units). On ASCII inputs — the KMV use feeds %016x hash hex — this
  * coincides with byte order, codepoint order, and the hash's unsigned
  * numeric order; callers feeding non-BMP strings should know UTF-16
  * order diverges from codepoint order there.
  */
final class DistinctMinKBuffer(val k: Int) {
  val set = new java.util.TreeSet[String]()

  def add(v: String): Unit = {
    if (set.contains(v)) return
    if (set.size < k) { set.add(v); () }
    else if (k > 0 && v.compareTo(set.last) < 0) {
      set.pollLast(); set.add(v); ()
    }
  }

  def mergeWith(o: DistinctMinKBuffer): DistinctMinKBuffer = {
    val it = o.set.iterator()
    while (it.hasNext) add(it.next())
    this
  }
}

/** distinct_mink(string) -> array<string> of the k smallest DISTINCT
  * values, ascending. Map-side partials truncate at k distinct entries,
  * so every exchange carries <= k strings per (partition, group) even
  * under all-distinct adversarial input — the property that makes the
  * KMV sketch scale-honest where a `distinct` pre-aggregation would
  * shuffle the full value set.
  */
case class DistinctMinKString(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DistinctMinKBuffer] with UnaryLike[Expression] {
  require(k > 0, "k must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): DistinctMinKBuffer = new DistinctMinKBuffer(k)

  override def update(b: DistinctMinKBuffer, input: InternalRow): DistinctMinKBuffer = {
    val v = child.eval(input)
    if (v != null)
      b.add(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
    b
  }

  override def merge(b: DistinctMinKBuffer, o: DistinctMinKBuffer): DistinctMinKBuffer =
    b.mergeWith(o)

  override def eval(b: DistinctMinKBuffer): Any = {
    val out = new Array[Any](b.set.size)
    val it = b.set.iterator()
    var i = 0
    while (it.hasNext) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: DistinctMinKBuffer): Array[Byte] = {
    val items = new Array[Array[Byte]](b.set.size)
    var total = 4
    val it = b.set.iterator()
    var i = 0
    while (it.hasNext) {
      val bytes = it.next().getBytes(StandardCharsets.UTF_8)
      items(i) = bytes
      total += 4 + bytes.length
      i += 1
    }
    val bb = ByteBuffer.allocate(total)
    bb.putInt(items.length)
    items.foreach { bytes => bb.putInt(bytes.length); bb.put(bytes) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): DistinctMinKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new DistinctMinKBuffer(k)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      b.add(new String(arr, StandardCharsets.UTF_8))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): DistinctMinKString =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DistinctMinKString =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): DistinctMinKString =
    copy(child = c)
  override def prettyName: String = "distinct_mink"
}

object DistinctMinKFunctions {
  /** The k smallest DISTINCT string values per group, ascending. */
  def distinctMinK(value: Column, k: Int): Column =
    GraftBridge.column(DistinctMinKString(
      GraftBridge.expression(value.cast("string")), k)
      .toAggregateExpression())
}
