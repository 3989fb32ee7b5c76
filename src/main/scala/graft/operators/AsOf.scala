package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed backward AS-OF join — attach to every left row the most
  * recent right row with the same key and timestamp <= the left row's
  * (inclusive), the operator behind point-in-time feature lookup,
  * snapshot enrichment, and attribution ("the click before this
  * purchase"). Spark has no built-in as-of join; the naive encodings
  * either explode (theta join on `r.ts <= l.ts` + per-left-row rank:
  * the join pairs every left row with its ENTIRE key history before
  * ranking) or collect (per-key sorted lookup on the driver).
  *
  * This implementation is the scale-safe UNION + WINDOW form:
  * tag both inputs, union them into one frame, and run ONE window
  * (partition by key, order by (ts, side)) carrying the last non-null
  * right payload forward — right rows sort BEFORE left rows at equal
  * timestamps, which is exactly the inclusive `r.ts <= l.ts` tie rule
  * (DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`, pandas `merge_asof`).
  * Cost: one hash exchange of |L| + |R| rows by key and a per-key sort —
  * no pair explosion, no driver state, AQE-splittable like any window.
  * The right payload travels as a single STRUCT so all carried columns
  * come from the SAME right row (carrying columns independently with
  * ignoreNulls would let a null field reach back to an OLDER row's
  * value).
  *
  * Contract: `right` must be unique per (key, ts) — the same
  * precondition DuckDB's ASOF join and pandas' merge_asof impose;
  * pre-aggregate duplicates upstream (as q48 does) to make the match
  * deterministic.
  *
  * Left-join semantics: left rows with no qualifying right row (none at
  * or before, or none within `toleranceMs`) keep null right columns.
  */
object AsOf {

  /** @param left        frame to enrich; all its columns pass through
    * @param right       lookup frame: (key, ts, payload...); unique per (key, ts)
    * @param key         equality join column name (same name both sides)
    * @param ts          event-time column name (same name both sides)
    * @param rightTsOut  output column holding the matched right row's ts
    * @param toleranceMs optional max age: matches older than
    *                    `left.ts - toleranceMs` are nulled out
    */
  def asofBackward(
      left: DataFrame, right: DataFrame, key: String, ts: String,
      rightTsOut: String = "asof_ts", toleranceMs: Option[Long] = None): DataFrame = {
    val payloadCols = right.columns.filterNot(c => c == key || c == ts).toSeq
    val clash = payloadCols.toSet ++ Set(rightTsOut) intersect left.columns.toSet
    require(clash.isEmpty, s"as-of output columns collide with left columns: $clash")
    require(right.columns.contains(key) && right.columns.contains(ts),
      s"right side must carry '$key' and '$ts'")
    val reserved = Set("__side", "__snap", "__carried")
      .intersect(left.columns.toSet ++ right.columns.toSet)
    require(reserved.isEmpty,
      s"column names $reserved are reserved by the as-of join (withColumn " +
        "would silently overwrite them)")

    // one struct per right row: all carried fields move together
    val snap = struct(col(ts).as(rightTsOut) +: payloadCols.map(col): _*)
    val leftCols = left.columns.toSeq
    val tagged = left
      .withColumn("__side", lit(1))
      .withColumn("__snap", lit(null).cast(right.select(snap).schema.head.dataType))
      .unionByName(
        right
          .select(col(key), col(ts), lit(0).as("__side"), snap.as("__snap"))
          .withColumns(
            leftCols.filterNot(c => c == key || c == ts)
              .map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap))
    // right rows sort first at equal ts: inclusive <= match
    val w = Window.partitionBy(key).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = tagged.withColumn("__carried", last(col("__snap"), ignoreNulls = true).over(w))
    // age test at MICROsecond precision (timestamps' native resolution):
    // a millisecond-floored difference would disagree with an exact
    // interval comparison for pairs straddling the boundary by sub-ms
    val aged = toleranceMs match {
      case Some(tol) => carried.withColumn("__carried",
        when(unix_micros(col(ts).cast("timestamp")) -
          unix_micros(col("__carried")(rightTsOut).cast("timestamp")) <= tol * 1000L,
          col("__carried")))
      case None => carried
    }
    aged
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        (rightTsOut +: payloadCols).map(c => col("__carried")(c).as(c)): _*)
  }
}
