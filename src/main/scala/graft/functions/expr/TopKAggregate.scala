package graft.functions.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CreateNamedStruct, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Bounded top-k buffer: a size-capped binary MIN-heap over
  * (score: Double, id: Long) entries, "worst first" so the root is the
  * eviction candidate. Ordering matches the ANN ranking convention
  * exactly — better = higher score, ties broken by SMALLER id — so
  * worst = lower score, ties broken by larger id. Capacity k keeps
  * update/merge O(log k) and the buffer's serialized form at
  * 4 + 16k bytes regardless of input size.
  */
final class TopKBuffer(val k: Int) {
  // parallel arrays, heap-ordered; size <= k
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** entry a is worse than entry b under the ranking order. */
  private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
      swap(i, (i - 1) / 2); i = (i - 1) / 2
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) done = true else { swap(i, m); i = m }
    }
  }

  def add(score: Double, id: Long): Unit = {
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1; siftUp(size - 1)
    } else if (k > 0 && worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id; siftDown(0)
    }
  }

  def mergeWith(o: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < o.size) { add(o.scores(i), o.ids(i)); i += 1 }
    this
  }

  /** Entries sorted best-first (score desc, id asc). */
  def sortedDesc: Array[(Double, Long)] =
    Array.tabulate(size)(i => (scores(i), ids(i)))
      .sortBy { case (s, id) => (-s, id) }
}

/** bounded_topk(struct(score, id)) -> array<struct<score, id>> of the k
  * best entries, best-first. A [[TypedImperativeAggregate]] whose
  * PARTIAL buffers are already k-capped, so the aggregation exchange
  * carries at most k entries per (partition, group) instead of every
  * scored row — the difference between a per-query window over n×q
  * scored rows (q hot partitions carrying the corpus) and a bounded
  * shuffle, for the whole ANN family. Runs in ObjectHashAggregateExec
  * with map-side partial merge, exactly like Spark's own
  * `percentile`.
  */
case class BoundedTopK(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] with UnaryLike[Expression] {
  require(k > 0, "k must be positive")

  private val entryType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))

  override def dataType: DataType = ArrayType(entryType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1)) b.add(row.getDouble(0), row.getLong(1))
    }
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = b.mergeWith(o)

  override def eval(b: TopKBuffer): Any =
    new GenericArrayData(b.sortedDesc.map { case (s, id) =>
      new GenericInternalRow(Array[Any](s, id))
    })

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * b.size)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putDouble(b.scores(i)); bb.putLong(b.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopKBuffer(k)
    var i = 0
    while (i < n) { b.add(bb.getDouble, bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "bounded_topk"
}

/** Bounded lexicographic MIN-k buffer over (score: bytes, id: Long) —
  * the STRING-ordered sibling of [[TopKBuffer]] for hash-ordered
  * deterministic sampling (keep the k lexicographically-smallest
  * (score, id) pairs). Worst-first max-heap: worst = larger byte string,
  * ties broken by larger id. Byte comparison is unsigned lexicographic —
  * exactly UTF8String's binary ordering, so results match a
  * string-ordered window row-for-row.
  */
final class MinKStringBuffer(val k: Int) {
  val scores = new Array[Array[Byte]](k)
  val ids = new Array[Long](k)
  var size = 0

  private def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** entry a is worse (= larger) than entry b. */
  private def worse(sa: Array[Byte], ia: Long, sb: Array[Byte], ib: Long): Boolean = {
    val c = cmpBytes(sa, sb)
    c > 0 || (c == 0 && ia > ib)
  }

  private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
      swap(i, (i - 1) / 2); i = (i - 1) / 2
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) done = true else { swap(i, m); i = m }
    }
  }

  def add(score: Array[Byte], id: Long): Unit = {
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1; siftUp(size - 1)
    } else if (k > 0 && worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id; siftDown(0)
    }
  }

  def mergeWith(o: MinKStringBuffer): MinKStringBuffer = {
    var i = 0
    while (i < o.size) { add(o.scores(i), o.ids(i)); i += 1 }
    this
  }

  /** Entries sorted smallest-first (score asc, id asc). */
  def sortedAsc: Array[(Array[Byte], Long)] = {
    val out = Array.tabulate(size)(i => (scores(i), ids(i)))
    scala.util.Sorting.stableSort(out,
      (a: (Array[Byte], Long), b: (Array[Byte], Long)) => {
        val c = cmpBytes(a._1, b._1)
        c < 0 || (c == 0 && a._2 < b._2)
      })
    out
  }
}

/** bounded_mink_str(struct(score string, id long)) -> array<struct<...>>
  * of the k lexicographically-smallest entries, smallest-first. Same
  * partial-truncation property as [[BoundedTopK]]; ordering matches a
  * (score asc, id asc) string window exactly (UTF8String binary order).
  */
case class BoundedMinKString(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MinKStringBuffer] with UnaryLike[Expression] {
  require(k > 0, "k must be positive")

  private val entryType = StructType(Seq(
    StructField("score", StringType, nullable = false),
    StructField("id", LongType, nullable = false)))

  override def dataType: DataType = ArrayType(entryType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MinKStringBuffer = new MinKStringBuffer(k)

  override def update(b: MinKStringBuffer, input: InternalRow): MinKStringBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1))
        // copy: the row's UTF8String may view a reused buffer
        b.add(row.getUTF8String(0).getBytes.clone(), row.getLong(1))
    }
    b
  }

  override def merge(b: MinKStringBuffer, o: MinKStringBuffer): MinKStringBuffer =
    b.mergeWith(o)

  override def eval(b: MinKStringBuffer): Any =
    new GenericArrayData(b.sortedAsc.map { case (s, id) =>
      new GenericInternalRow(Array[Any](
        org.apache.spark.unsafe.types.UTF8String.fromBytes(s), id))
    })

  override def serialize(b: MinKStringBuffer): Array[Byte] = {
    var total = 4
    var i = 0
    while (i < b.size) { total += 4 + b.scores(i).length + 8; i += 1 }
    val bb = ByteBuffer.allocate(total)
    bb.putInt(b.size)
    i = 0
    while (i < b.size) {
      bb.putInt(b.scores(i).length); bb.put(b.scores(i)); bb.putLong(b.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MinKStringBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new MinKStringBuffer(k)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val s = new Array[Byte](len)
      bb.get(s)
      b.add(s, bb.getLong)
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedMinKString =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedMinKString =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "bounded_mink_str"
}

/** Column-API entry points. */
object TopKFunctions {
  /** The k best (score desc, id asc) entries per group, best-first, as
    * array<struct<score double, id long>>.
    */
  def boundedTopK(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(BoundedTopK(
      CreateNamedStruct(Seq(
        Literal("score"), GraftBridge.expression(score.cast("double")),
        Literal("id"), GraftBridge.expression(id.cast("long")))), k)
      .toAggregateExpression())

  /** The k lexicographically-smallest (score asc, id asc) entries per
    * group, smallest-first, as array<struct<score string, id long>>.
    */
  def boundedMinKString(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(BoundedMinKString(
      CreateNamedStruct(Seq(
        Literal("score"), GraftBridge.expression(score.cast("string")),
        Literal("id"), GraftBridge.expression(id.cast("long")))), k)
      .toAggregateExpression())
}
