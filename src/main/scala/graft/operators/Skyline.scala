package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D SKYLINE (Pareto frontier, Börzsönyi et al. ICDE 2001) — the
  * dominance filter behind "cheapest AND smallest" style shortlists:
  * keep every row no other row beats on both dimensions (≤ on both, <
  * on at least one; exact duplicates are mutually undominated and both
  * survive).
  *
  * The textbook block-nested-loops algorithm is all-pairs. In 2-D the
  * frontier has a closed form over the X-GROUP table: a row (x, y) is
  * dominated iff  min-y over x' < x  ≤ y,  or some same-x row has a
  * strictly smaller y. So the whole operator is (1) one x-keyed
  * aggregation to per-x min-y (state = distinct-x count — the
  * histogram-domain contract), (2) one EXCLUSIVE prefix-min window
  * over that tiny table, (3) a broadcast join back and a map-side
  * predicate. Never a pair surface, never a corpus sort.
  *
  * Reference scope: no preference queries in the reference; extension
  * — the multi-objective shortlist a catalogue/quality pipeline runs
  * (cost vs latency, size vs price).
  */
object Skyline {

  /** Rows of `df` on the minimizing skyline of (xCol, yCol), both
    * integer-valued non-null.
    */
  def skyline2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val perX = df.groupBy(col(xCol).as("__x"))
      .agg(min(col(yCol)).as("__miny"))
    val wPrev = Window.orderBy("__x").rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perX
      .withColumn("__prevmin", min(col("__miny")).over(wPrev))
      .select(col("__x"), col("__miny"), col("__prevmin"))
    df.join(broadcast(frontier), col(xCol) === col("__x"))
      .filter(
        // not dominated from strictly-smaller x…
        (col("__prevmin").isNull || col("__prevmin") > col(yCol)) &&
          // …and minimal among its own x ties
          col(yCol) === col("__miny"))
      .drop("__x", "__miny", "__prevmin")
  }
}
