package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.expr.HashFunctions.{bloomContains, cmsBuckets}

/** Bloom-filter membership gate (Bloom 1970) over item fingerprints —
  * the pre-filter a 100 TB incremental ingest puts in FRONT of the exact
  * membership anti-join (q50's shape): the corpus folds once into a
  * fixed-size bit set; each increment row then answers "definitely new"
  * MAP-SIDE through a compiled expression carrying the packed bits as a
  * plan reference (8 KB at logW=16 — the NearestCells/PqEncode
  * runtime-state pattern), so a definitely-new row never enters a join
  * or shuffle at all. Only the maybe-members (true members + the bounded
  * false-positive sliver, rate ~ (1 - e^(-dn/w))^d) proceed to the exact
  * verify join.
  *
  * Probe positions reuse the CMS multiply-shift row-hash family
  * ([[graft.functions.expr.TextHashOps.cmsBuckets]]): d positions per
  * item over a 2^logW-bit space, all integer arithmetic over the
  * engine's avalanched hash64 — so like q103/q104 the whole construction
  * (set bits AND the gate verdicts) replays bit-exactly in a SQL oracle.
  *
  * Build cost: one map + one <= 2^logW-key distinct (map-side
  * combinable); the packed bits collect to the driver at bit-set size,
  * independent of corpus size — the codebook-sized-collect contract of
  * the IVF/PQ family.
  */
object Bloom {

  /** Distinct probe positions set by `item` over `rows` — the filter in
    * relational form (<= 2^logW rows of int `pos`), for persistence or
    * oracle inspection.
    */
  def positions(rows: DataFrame, item: Column, d: Int = 4, logW: Int = 16): DataFrame =
    rows.select(explode(cmsBuckets(item.cast("string"), d, logW)).as("pos"))
      .distinct()

  /** The filter as packed bits (2^logW / 64 longs), built with one
    * bit-set-sized driver collect.
    */
  def build(rows: DataFrame, item: Column, d: Int = 4, logW: Int = 16): Array[Long] = {
    val bits = new Array[Long]((1 << logW) / 64)
    positions(rows, item, d, logW).collect().foreach { r =>
      val pos = r.getInt(0)
      bits(pos >>> 6) |= (1L << (pos & 63))
    }
    bits
  }

  /** Gate `rows` through built bits: adds `bloom_maybe` — false means
    * definitely not a member (the Bloom guarantee, decided map-side with
    * no shuffle); true means "verify exactly".
    */
  def gate(
      rows: DataFrame, item: Column, bits: Array[Long],
      d: Int = 4, logW: Int = 16): DataFrame =
    rows.withColumn("bloom_maybe", bloomContains(item.cast("string"), bits, d, logW))
}
