package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** EXACT k-th order statistic of an integer column with BOUNDED state —
  * the distributed-selection primitive behind threshold-style top-k
  * flagging ([[Dsir.flagByThreshold]]): where a `orderBy(...).limit(k)`
  * take-ordered funnels k rows through one partition (and overflows
  * `limit`'s Int past 2³¹), this computes the VALUE at rank k and lets
  * callers flag by a map-side comparison instead, so no corpus-sized or
  * k-sized row set ever converges on one node.
  *
  * Method: radix refinement over the 64-bit two's-complement pattern
  * (sign bit flipped so unsigned bucket order == signed value order),
  * 16 bits per round — each round is ONE map-side-combined histogram
  * aggregate over at most 2^16 buckets (the driver receives ≤ 65536
  * rows, constant regardless of data size), after which the bucket
  * holding rank k is fixed and the next round refines within it. At
  * most four rounds pin all 64 bits; a min/max probe first skips every
  * 16-bit block the whole column SHARES (a ±2^30 micro-nat weight or a
  * dense id column needs two rounds, not four), and the walk also
  * yields the strictly-beyond count and the at-value count for free, so
  * a threshold flagger pays no separate boundary-accounting jobs.
  * Exact, deterministic, and each round is a full map-side pass over
  * the (usually pinned) input. This is the classic distributed
  * selection-by-radix construction — the BOUNDED sibling of
  * [[ExactPercentiles]]' value histogram, which needs the distinct-value
  * set itself to be small (an assumption a corpus-sized weight column
  * cannot make).
  *
  * Reference scope: the reference has no selection surface
  * (`src/etl_pipeline.py` is a fixed ETL); extension (training-data
  * pipeline family).
  */
object OrderStat {

  private val BitsPerRound = 16
  private val Rounds = 64 / BitsPerRound
  private val Mask = (1L << BitsPerRound) - 1

  /** A resolved rank: the (1-based) rank itself, the value at it, how
    * many rows are strictly better (greater for a largest-rank, smaller
    * for a smallest-rank), and how many rows hold exactly `value` — the
    * boundary-tie accounting a threshold selector needs, emitted by the
    * same walk.
    */
  final case class Ranked(rank: Long, value: Long, beyond: Long, atValue: Long)

  /** The k-th SMALLEST value (1-based rank, duplicates counted):
    * exactly `sorted(values)(k-1)`. Nulls are ignored; fails fast when
    * k exceeds the non-null row count.
    */
  def kthSmallest(df: DataFrame, valueCol: String, k: Long): Long =
    rankStat(df, valueCol, k, largest = false).value

  /** The k-th LARGEST value (1-based rank, duplicates counted). */
  def kthLargest(df: DataFrame, valueCol: String, k: Long): Long =
    rankStat(df, valueCol, k, largest = true).value

  /** The full walk: value at rank k in the chosen direction plus the
    * boundary counts (see [[Ranked]]).
    */
  private[operators] def rankStat(
      df: DataFrame, valueCol: String, k: Long, largest: Boolean): Ranked =
    rankStatImpl(df, valueCol, Left(k), largest)

  /** [[rankStat]] with the rank derived as ⌈fraction·n⌉ from the SAME
    * first probe that measures the span — a fraction-shaped caller
    * ([[Dsir.selectTop]]) pays no separate count job.
    */
  private[operators] def rankStatFraction(
      df: DataFrame, valueCol: String, fraction: Double, largest: Boolean): Ranked = {
    require(fraction > 0 && fraction <= 1, s"fraction in (0, 1], got $fraction")
    rankStatImpl(df, valueCol, Right(fraction), largest)
  }

  private def rankStatImpl(
      df: DataFrame, valueCol: String, kOrFraction: Either[Long, Double],
      largest: Boolean): Ranked = {
    kOrFraction.left.foreach(k => require(k >= 1, s"rank is 1-based, got $k"))
    val dt = df.schema(valueCol).dataType
    require(Seq(LongType, IntegerType, ShortType, ByteType).contains(dt),
      s"rank selection needs an integer column, $valueCol is $dt")
    val v = col(valueCol).cast(LongType)
    // one probe: span (to skip shared high blocks) + non-null count
    val mm = df.agg(min(v).as("lo"), max(v).as("hi"), count(v).as("n")).collect()(0)
    require(!mm.isNullAt(0), s"rank over an empty/all-null column $valueCol")
    val (lo, hi, n) = (mm.getLong(0), mm.getLong(1), mm.getLong(2))
    val k = kOrFraction.fold(identity, f => math.ceil(f * n).toLong)
    require(k <= n, s"rank $k exceeds the non-null row count $n of $valueCol")
    if (lo == hi) return Ranked(k, lo, 0L, n)
    // sign-bit flip: unsigned order of u == signed order of the value
    val u = v.bitwiseXOR(lit(Long.MinValue))
    val (uLo, uHi) = (lo ^ Long.MinValue, hi ^ Long.MinValue)
    val skip = java.lang.Long.numberOfLeadingZeros(uLo ^ uHi) / BitsPerRound
    var prefix = if (skip == 0) 0L else uLo >>> (64 - BitsPerRound * skip)
    var remaining = k
    var atValue = 0L
    var first = true
    (skip until Rounds).foreach { level =>
      val shift = 64 - BitsPerRound * (level + 1)
      // the first walked level needs no prefix filter: min/max bound
      // every row inside the shared blocks
      val inPrefix =
        if (first) v.isNotNull
        else shiftrightunsigned(u, shift + BitsPerRound) === lit(prefix)
      first = false
      val hist = df.filter(inPrefix)
        .groupBy(shiftrightunsigned(u, shift).bitwiseAND(lit(Mask)).as("bkt"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(if (largest) col("bkt").desc else col("bkt").asc)
        .collect() // ≤ 2^16 rows by construction — never data-sized
      var i = 0
      var found = -1L
      while (i < hist.length && found < 0) {
        val c = hist(i).getLong(1)
        if (remaining <= c) { found = hist(i).getLong(0); atValue = c }
        else remaining -= c
        i += 1
      }
      assert(found >= 0,
        s"histogram walk lost rank $k at level $level (corrupted input?)")
      prefix = (prefix << BitsPerRound) | found
    }
    // at the final level the bucket IS the exact value, so its count is
    // the at-value tally and k - remaining the strictly-beyond tally
    Ranked(k, prefix ^ Long.MinValue, k - remaining, atValue)
  }
}
