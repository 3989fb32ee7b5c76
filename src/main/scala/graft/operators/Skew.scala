package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted inner equi-join for HOT-KEY skew.
  *
  * The default fix is AQE's skew-join split — it is on session-wide and
  * handles most batch skew without help. Reach for explicit salting
  * where AQE cannot:
  *
  *   - the skewed key feeds a WINDOW or other single-partition-per-key
  *     operator downstream (AQE splits shuffle partitions, not key
  *     groups);
  *   - STREAMING stateful joins/aggregations (no adaptive re-planning
  *     mid-stream);
  *   - sort-merge shuffles whose skew exceeds what partition-splitting
  *     amortizes, when the other side is small enough to replicate
  *     `salts`× but too big (or on the wrong side of a left join) to
  *     broadcast.
  *
  * Left rows scatter across `salts` sub-keys by hashing the join key
  * TOGETHER WITH the row's partition-local position
  * (`monotonically_increasing_id`) — the position term is what spreads
  * identical hot rows (a key-only or whole-row hash would assign every
  * copy the same salt), and hashing just the key keeps the expression
  * legal for rows carrying unhashable columns (maps) and free of wide-row
  * hashing cost. No RNG state: a task retry recomputes the
  * same ids, so the layout is stable within a run; across different
  * input layouts the salt ASSIGNMENT may differ but the joined result
  * never does — it is IDENTICAL to the unsalted join (SkewSpec pins it,
  * q61's oracle proves it end-to-end). Cost: |right|·salts replicated
  * rows.
  */
object Skew {

  /** Inner equi-join of `left` and `right` on `key` (same name both
    * sides), salted `salts` ways. `salts = 1` degenerates to the plain
    * join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "__salt column name is reserved")
    val l = left.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()),
        lit(salts.toLong)).cast("int"))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
