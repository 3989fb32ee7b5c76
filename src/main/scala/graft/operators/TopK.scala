package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.expr.TopKFunctions.boundedTopK

/** Shared per-query ranking tail for the ANN family (brute/LSH/IVF/PQ).
  *
  * Replaces the `row_number` window: a window must shuffle EVERY scored
  * row keyed by query_id — for a small query batch that is q hot
  * partitions carrying corpus-sized data, the classic scale cliff of
  * rank-then-filter. [[graft.functions.expr.BoundedTopK]] instead
  * truncates at k INSIDE the map-side partial aggregation, so the
  * exchange carries at most k entries per (partition, query) and the
  * per-query reduce merges k-capped heaps. Output matches the window
  * formulation row-for-row: rank 1..k by (score desc, id asc), score
  * rounded to 6dp at projection (ranking happens on unrounded scores).
  *
  * Input rows must be unique per (query, neighbor) — true for every
  * caller (brute/IVF/PQ by construction, LSH after its candidate
  * distinct); duplicate entries would occupy multiple top-k slots.
  */
private[operators] object TopK {
  def perQuery(
      scored: DataFrame, k: Int,
      queryCol: String = "query_id", idCol: String = "neighbor_id",
      scoreCol: String = "cosine"): DataFrame =
    scored.groupBy(col(queryCol))
      .agg(boundedTopK(col(scoreCol), col(idCol), k).as("top"))
      .select(col(queryCol), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col(queryCol), (col("pos") + 1).cast("long").as("rank"),
        col("e.id").as(idCol), round(col("e.score"), 6).as(scoreCol))
}
