package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the `ANALYZE`/data-quality summary a pipeline runs
  * before trusting a new drop of data: per column, row count, null
  * count, exact distinct count, and min/max (rendered as strings so one
  * schema covers every column type).
  *
  * Shape: ONE aggregation pass computes every per-column statistic
  * (Spark plans the n distinct-aggregates as a single Expand + two-phase
  * aggregate — the stream is read once, expanded n-fold in-memory, never
  * re-scanned), then the single result row unpivots into one row per
  * column via an array-of-structs explode on the driver-sized result.
  * At 100 TB the exact distinct counts are the expensive honest choice
  * (each shuffles that column's distinct values); swap in
  * [[Hll.approxCountDistinct]] per column when estimates suffice — the
  * profile schema does not change.
  *
  * Reference scope: the reference's ad-hoc `df.info()`/`df.nunique()`
  * introspection surface (O9), promoted to a first-class queryable
  * operator.
  */
object Profile {

  /** Per-column profile of `cols`, one row per column, ordered by column
    * name: (column, dtype, n_rows, n_nulls, n_distinct, min_val,
    * max_val).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    cols.foreach(c => require(types.contains(c), s"no such column: $c"))
    val aggs =
      count(lit(1)).as("_n") +:
        cols.flatMap(c => Seq(
          count(col(c)).as(s"_nn_$c"),
          count_distinct(col(c)).as(s"_nd_$c"),
          min(col(c)).cast("string").as(s"_min_$c"),
          max(col(c)).cast("string").as(s"_max_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(cols.map(c => struct(
      lit(c).as("column"),
      lit(types(c)).as("dtype"),
      col("_n").as("n_rows"),
      (col("_n") - col(s"_nn_$c")).as("n_nulls"),
      col(s"_nd_$c").as("n_distinct"),
      col(s"_min_$c").as("min_val"),
      col(s"_max_$c").as("max_val"))): _*)
    one.select(explode(rows).as("r")).select(col("r.*")).orderBy("column")
  }
}
