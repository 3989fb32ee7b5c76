package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.expr.FreqFunctions.mgSummary

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
}
