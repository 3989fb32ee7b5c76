package graft.functions.expr

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary with at most `capacity` counters
  * (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS 2012). Invariant: for a stream of n items, every
  * stored count undercounts its item's true frequency by at most
  * n/(capacity+1), and — the guarantee the two-pass heavy-hitter
  * operator rests on — **any item with true frequency > n/(capacity+1)
  * is present in the summary**. The merge subtracts the (capacity+1)-th
  * largest count from everything and drops non-positives, which keeps
  * the summed error bound additive across partitions, so the guarantee
  * survives Spark's partial/final aggregation split.
  */
final class MGBuffer(val capacity: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def add(item: String, weight: Long = 1L): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + weight)
      case None =>
        if (counts.size < capacity) counts.update(item, weight)
        else {
          // decrement-all by the new item's weight, capped at the
          // smallest stored count so no counter goes negative; the
          // remainder (if any) re-enters as a smaller insert
          val dec = math.min(weight, counts.valuesIterator.min)
          val dead = mutable.ArrayBuffer.empty[String]
          counts.mapValuesInPlace((_, c) => c - dec)
          counts.foreach { case (k, c) => if (c <= 0L) dead += k }
          dead.foreach(counts.remove)
          val rest = weight - dec
          if (rest > 0L) add(item, rest)
        }
    }
  }

  def mergeWith(o: MGBuffer): MGBuffer = {
    o.counts.foreach { case (k, c) =>
      counts.update(k, counts.getOrElse(k, 0L) + c)
    }
    if (counts.size > capacity) {
      // subtract the (capacity+1)-th largest count, drop non-positives
      val sorted = counts.values.toArray
      java.util.Arrays.sort(sorted)
      val cut = sorted(sorted.length - (capacity + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace((_, c) => c - cut)
      counts.foreach { case (k, c) => if (c <= 0L) dead += k }
      dead.foreach(counts.remove)
    }
    this
  }

  /** Entries sorted (count desc, item asc) — stable driver-facing order. */
  def sortedDesc: Array[(String, Long)] =
    counts.toArray.sortBy { case (k, c) => (-c, k) }
}

/** mg_summary(item) -> array<struct<item string, lower_count long>>:
  * the surviving Misra–Gries counters, count-descending. The PARTIAL
  * buffers are already capacity-capped, so the aggregation exchange
  * carries at most `capacity` (item, count) pairs per partition — the
  * candidate pass of a two-pass exact heavy-hitter at 100 TB never
  * shuffles the token stream itself.
  */
case class MisraGriesSummary(
    child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGBuffer] with UnaryLike[Expression] {
  require(capacity > 0, "capacity must be positive")

  private val entryType = StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("lower_count", LongType, nullable = false)))

  override def dataType: DataType = ArrayType(entryType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(capacity)

  override def update(b: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: MGBuffer, o: MGBuffer): MGBuffer = b.mergeWith(o)

  override def eval(b: MGBuffer): Any =
    new GenericArrayData(b.sortedDesc.map { case (item, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), c))
    })

  override def serialize(b: MGBuffer): Array[Byte] = {
    val entries = b.counts.toArray.map { case (k, c) =>
      (k.getBytes(StandardCharsets.UTF_8), c)
    }
    val total = 4 + entries.map(e => 4 + e._1.length + 8).sum
    val bb = ByteBuffer.allocate(total)
    bb.putInt(entries.length)
    entries.foreach { case (bytes, c) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new MGBuffer(capacity)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val s = new Array[Byte](len)
      bb.get(s)
      b.counts.update(new String(s, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesSummary =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesSummary =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "mg_summary"
}

/** Column-API entry point. */
object FreqFunctions {
  /** Misra–Gries summary of `item` with at most `capacity` counters:
    * array<struct<item string, lower_count long>>, count-descending.
    * Complete for every item with frequency > n/(capacity+1).
    */
  def mgSummary(item: Column, capacity: Int): Column =
    GraftBridge.column(MisraGriesSummary(
      GraftBridge.expression(item.cast("string")), capacity)
      .toAggregateExpression())
}
