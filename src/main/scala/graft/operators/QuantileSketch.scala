package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.expr.{HashFunctions, TopKFunctions}

/** Mergeable bottom-k order-statistics sketch: per group, keep the k rows
  * whose public hash64 of the row id is smallest (a bottom-k "priority"
  * sample, Cohen & Kaplan 2007), and answer quantile q with the
  * ceil(q·k')-th smallest retained VALUE (k' = |sample| = min(k, n)).
  * A bottom-k sample is a uniform without-replacement sample whose
  * membership is a pure function of the input SET — deterministic across
  * runs, engines, partitionings, and merge orders — so unlike KLL-style
  * compactor hierarchies (whose state depends on processing order) the
  * whole sketch replays bit-exactly in SQL from the public hash chain:
  * no randomness, no libm, integer-only rank arithmetic.
  *
  * Merge = union the samples, keep the k smallest hashes: bottom-k of a
  * union equals bottom-k of the merged bottom-k's, so sketches built per
  * partition/segment combine losslessly (QuantileSketchSpec pins this).
  *
  * Complements [[ExactPercentiles]]: that operator is exact with state
  * bounded by the DISTINCT-VALUE histogram per group; this one bounds
  * state at k rows per group regardless of value cardinality — the right
  * trade when per-group value histograms are too wide (e.g. continuous
  * measures at 100 TB). Error: for quantile q, the estimate's true rank
  * deviates from q·n by O(sqrt(q(1-q)/k'))·n with the usual
  * without-replacement concentration; sampling fraction k'/n only
  * tightens it (k' = n degenerates to the exact order statistic).
  *
  * Scale shape: ranking rides the bounded MIN-k aggregate
  * ([[graft.functions.expr.TopKAggregate]]) — map-side partials truncate
  * at k, so every exchange carries <= k (hash, value) entries per
  * (partition, group), never a group's row set. The quantile extraction
  * is per-group array surgery over k elements.
  *
  * `ps` quantiles are (name, percent) with integer percents so the rank
  * rule `ceil(q·k') = (k'·p + 99) div 100` stays integer-exact on both
  * engines.
  */
object QuantileSketch {

  /** The sketch state per group: exact row count `n` plus the bottom-k
    * sample `smp` (array<struct<score: hash-hex, id: value>>, hash-asc).
    */
  def sample(
      df: DataFrame, groupCols: Seq[String], idCol: String, valueCol: String,
      k: Int, salt: String): DataFrame =
    df.select(
        groupCols.map(col) ++ Seq(
          hashKey(col(idCol), salt).as("hk"),
          col(valueCol).cast("long").as("v")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        TopKFunctions.boundedMinKString(col("hk"), col("v"), k).as("smp"))

  /** The %016x-padded unsigned-hex hash64 of `salt + ":" + id` — its
    * LEXICOGRAPHIC order is the hash's unsigned numeric order, which is
    * how the oracle (HUGEINT in [0, 2^64)) ranks the same rows.
    */
  def hashKey(id: Column, salt: String): Column =
    format_string("%016x", HashFunctions.hash64(
      concat(lit(salt + ":"), id.cast("string"))))

  /** Quantile extraction from a [[sample]] frame. */
  def quantiles(sampled: DataFrame, groupCols: Seq[String],
      ps: Seq[(String, Int)]): DataFrame = {
    val withVals = sampled
      .withColumn("sample_n", size(col("smp")).cast("long"))
      .withColumn("vals", array_sort(expr("transform(smp, x -> x.id)")))
    // guard the rank pick: an EMPTY sample (a group whose every value was
    // null) makes the ceiling rank 0, and element_at(vals, 0) is a runtime
    // error under ANSI ("array index starts at 1") — degenerate groups
    // must yield null quantiles, not a task-killing exception
    val pCols = ps.map { case (name, p) =>
      when(col("sample_n") > 0,
        element_at(col("vals"),
          expr(s"cast((sample_n * $p + 99) div 100 as int)"))).as(name)
    }
    withVals.select(groupCols.map(col) ++ Seq(col("n"), col("sample_n")) ++ pCols: _*)
  }

  /** sample + quantiles in one call (the query surface). */
  def byGroup(
      df: DataFrame, groupCols: Seq[String], idCol: String, valueCol: String,
      k: Int, salt: String, ps: Seq[(String, Int)]): DataFrame =
    quantiles(sample(df, groupCols, idCol, valueCol, k, salt), groupCols, ps)
}
