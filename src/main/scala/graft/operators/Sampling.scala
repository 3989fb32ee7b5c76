package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.expr.HashFunctions.hash64

/** Deterministic weighted sampling without replacement (Efraimidis &
  * Spirakis 2006, algorithm A-ES): every row draws the key
  * ln(u_i) / w_i with u_i a uniform derived from the row's id, and the
  * k LARGEST keys are the sample — distributionally equivalent to
  * sequential weighted draws without replacement, but embarrassingly
  * parallel and reproducible (same ids + salt -> same sample, on any
  * engine, at any partitioning).
  *
  * The uniform is hash-derived, not `rand()`: u_i = (top53(hash64(id ||
  * ':' || salt)) + 1) / 2^53 — exact integer bit operations into an
  * exactly-representable double, so u_i is bit-identical in any replay
  * (the +1 keeps u in (0, 1]: ln(0) would go NULL in Spark vs -inf in
  * DuckDB). The only libm call is one LN; its last-ulp differences
  * across engines could in principle flip a selection between keys
  * within ~1e-15 of each other — no such tie exists on continuous
  * weights, and the oracle run is the regression test for that.
  *
  * Scale shape: the key is computed map-side in the scan stage;
  * `ORDER BY key LIMIT k` plans as TakeOrderedAndProject — each
  * partition forwards at most k rows, the driver merges partition
  * heads; no global sort, no full shuffle (plan-pinned in
  * SamplingSpec). The weighted mixture step of a pretraining pipeline
  * ([[Mixture.resample]] reshapes by group; this samples a FIXED BUDGET
  * by per-row weight).
  */
object Sampling {

  /** The k rows with the largest A-ES keys, as (idCol, weight, key
    * ROUND 6), ordered by id. Rows with weight <= 0 are excluded (zero
    * weight = never sampled; A-ES requires strictly positive weights).
    * `weight` is reported in the column's ORIGINAL type — a long cast
    * here would display fractional weights truncated while they still
    * (correctly) influenced the key (r9 verdict watch-item).
    */
  def weightedSample(
      rows: DataFrame, idCol: String, weightCol: String, k: Int,
      salt: String = "aes"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val x = hash64(concat(col(idCol).cast("string"), lit(":" + salt)))
    val u = (shiftrightunsigned(x, 11) + lit(1L)).cast("double") /
      lit((1L << 53).toDouble)
    rows.filter(col(weightCol) > 0)
      .select(col(idCol), col(weightCol).as("weight"),
        (log(u) / col(weightCol).cast("double")).as("_key"))
      .orderBy(col("_key").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("weight"), round(col("_key"), 6).as("key"))
      .orderBy(idCol)
  }
}
