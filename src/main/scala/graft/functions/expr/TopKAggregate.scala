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

/** Column-API entry point. */
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
}
