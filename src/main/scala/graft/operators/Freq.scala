package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.expr.FreqFunctions.mgSummary
import graft.functions.expr.HashFunctions.cmsBuckets

/** Exact heavy hitters over an unbounded item stream in two bounded
  * passes — the canonical frequent-items shape for a corpus too large
  * to shuffle by item:
  *
  *  1. **Candidate pass**: a Misra–Gries summary with ⌈1/φ⌉ counters
  *     ([[graft.functions.expr.MisraGriesSummary]]) plus a plain total
  *     count, both in ONE aggregation whose partial buffers are
  *     capacity-capped — the exchange carries ≤ capacity entries per
  *     partition, never the item stream. MG guarantees every item with
  *     true frequency > n/(capacity+1) ≤ φn survives, so the candidate
  *     set is a superset of the answer.
  *  2. **Verify pass**: exact counts restricted to the ≤ ⌈1/φ⌉
  *     candidates (a map-side `isin` filter that reaches the scan), then
  *     the exact threshold `count > φn`. The only shuffle keyed by item
  *     carries candidate items only.
  *
  * The result is EXACT — the sketch only prunes, never decides — which
  * is why the query has a full DuckDB oracle (`HAVING count > φ·n`)
  * despite the approximate first pass. Candidates collect to the driver
  * is ≤ ⌈1/φ⌉ strings (codebook-sized, like the IVF/PQ collects).
  *
  * Reference scope: the reference's `value_counts` surface
  * (`src/etl_pipeline.py:153`) is the full exact count (A1/q09); this is
  * its 100 TB-safe sibling for the "which items dominate" question.
  */
object Freq {

  /** Items of `item` (over `rows`) with exact count > phi * total,
    * as (item, cnt), count-descending then item. phi in (0, 1).
    */
  def exactHeavyHitters(rows: DataFrame, item: Column, phi: Double): DataFrame = {
    require(phi > 0.0 && phi < 1.0, s"phi must be in (0,1), got $phi")
    val capacity = math.ceil(1.0 / phi).toInt
    val spark = rows.sparkSession

    val stream = rows.select(item.cast("string").as("item")).filter(col("item").isNotNull)
    val pass1 = stream.agg(
      mgSummary(col("item"), capacity).as("cands"),
      count(lit(1)).as("n")).head()
    val n = pass1.getLong(1)
    val cands: Seq[String] = pass1.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))

    if (cands.isEmpty || n == 0L)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("item",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("cnt",
            org.apache.spark.sql.types.LongType, nullable = false))))

    stream.filter(col("item").isin(cands: _*))
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > lit(phi) * lit(n.toDouble))
      .orderBy(col("cnt").desc, col("item"))
  }

  /** Count-Min heavy hitters (Cormode & Muthukrishnan 2005): items whose
    * CMS ESTIMATE exceeds phi * n, as (item, est_cnt), estimate-descending
    * then item. The one-sided error contract — est_cnt >= true count
    * always, so the result is a SUPERSET of [[exactHeavyHitters]] at the
    * same phi, with overshoot bounded by n·e/2^logW per row (d rows take
    * the min).
    *
    * The 100 TB shape this buys over exact counting: the OCCURRENCE
    * stream is never shuffled by item. Pass 1 folds it into a d·2^logW
    * counter grid (partial aggregation reduces every partition to ≤ d·w
    * rows before the exchange; w and d are constants). Pass 2 touches
    * only the DISTINCT vocabulary — orders of magnitude smaller than the
    * stream, and itself map-side-combinable — and joins it to the
    * BROADCAST sketch. Nothing keyed by item ever carries a count of the
    * full stream.
    *
    * Every step is integer arithmetic over the engine's avalanched hash
    * ([[graft.functions.expr.TextHashOps.cmsBuckets]]), so unlike
    * classical randomized sketches the whole query carries a bit-exact
    * DuckDB oracle (the q22/q32 HUGEINT mod-2^64 replay, extended to the
    * sketch family).
    */
  def cmsHeavyHitters(
      rows: DataFrame, item: Column, phi: Double,
      d: Int = 4, logW: Int = 10): DataFrame =
    cmsHeavyHittersFromGrid(cmsGrid(rows, item, d, logW), rows, item, phi, d, logW)

  /** The d×2^logW occurrence counter grid — the CMS state itself.
    * Counters merge by SUM, so the grid is a mergeable sketch: per-
    * partition partials combine losslessly, and the same aggregation run
    * as STREAMING state (complete mode) drains to the identical grid —
    * the basis of q116's shared oracle.
    */
  def cmsGrid(rows: DataFrame, item: Column, d: Int = 4, logW: Int = 10): DataFrame =
    rows.select(item.cast("string").as("item"))
      .filter(col("item").isNotNull)
      .withColumn("bs", cmsBuckets(col("item"), d, logW))
      .select(posexplode(col("bs")).as(Seq("i", "bucket")))
      .groupBy("i", "bucket").agg(count(lit(1)).as("cnt"))

  /** Heavy-hitter readout over an ALREADY-BUILT counter grid: estimates
    * touch only the distinct candidate vocabulary against the broadcast
    * sketch ([[cmsHeavyHitters]]'s pass 2, decoupled so a streamed-in
    * grid answers the same question).
    */
  def cmsHeavyHittersFromGrid(
      grid: DataFrame, candidates: DataFrame, item: Column, phi: Double,
      d: Int = 4, logW: Int = 10): DataFrame = {
    require(phi > 0.0 && phi < 1.0, s"phi must be in (0,1), got $phi")
    val sketch = CacheScope.pin(grid, StorageLevel.MEMORY_AND_DISK)
    // every occurrence lands in exactly one bucket of row 0
    val n = sketch.filter(col("i") === 0)
      .agg(coalesce(sum("cnt"), lit(0L))).head().getLong(0)
    candidates.select(item.cast("string").as("item"))
      .filter(col("item").isNotNull)
      .withColumn("bs", cmsBuckets(col("item"), d, logW))
      .distinct()
      .select(col("item"), posexplode(col("bs")).as(Seq("i", "bucket")))
      .join(broadcast(sketch), Seq("i", "bucket"))
      .groupBy("item").agg(min("cnt").as("est_cnt"))
      .filter(col("est_cnt") > lit(phi) * lit(n.toDouble))
      .orderBy(col("est_cnt").desc, col("item"))
  }
}
