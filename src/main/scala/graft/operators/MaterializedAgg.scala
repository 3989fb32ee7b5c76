package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of an ADDITIVE aggregate (materialized-view
  * delta merge): given the stored aggregate state of the corpus and a
  * delta of new fact rows, produce the aggregate of corpus ∪ delta
  * WITHOUT rescanning the corpus.
  *
  * Additive means every maintained measure is a SUM or COUNT (store
  * sum+count to derive avg at read; min/max and distinct are NOT
  * incrementally maintainable this way under deletes and need their own
  * structures). The merge is `union of aggregate-row sets → re-group`,
  * so the only shuffle is over #groups(state) + #groups(delta) rows —
  * at 100 TB the corpus contributes its aggregate rows (thousands),
  * never its facts. Deletes/retractions merge the same way with negated
  * measures, the classic incremental view-maintenance trick.
  *
  * Reference scope: the reference recomputes its summary queries from
  * the full SQLite table each run (`src/etl_pipeline.py:210-246`); this
  * is the daily-ingest shape those summaries need at scale, maintained
  * exactly (q101's oracle IS the full recompute).
  */
object MaterializedAgg {

  /** Aggregate `facts` by `keys` with sum(`measures`) — the canonical
    * state builder for both the corpus state and each delta.
    */
  def additiveState(facts: DataFrame, keys: Seq[String],
      measures: Map[String, org.apache.spark.sql.Column]): DataFrame = {
    val aggs = measures.toSeq.sortBy(_._1)
      .map { case (name, expr) => sum(expr).as(name) }
    facts.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge aggregate states (same schema: keys ++ measure sums).
    * Groups present in either side survive; measures add.
    */
  def mergeAdditive(state: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    val measures = state.columns.filterNot(keys.contains).toSeq
    require(delta.columns.sorted.sameElements(state.columns.sorted),
      s"state/delta schema mismatch: ${state.columns.toSeq} vs ${delta.columns.toSeq}")
    val aggs = measures.map(m => sum(col(m)).as(m))
    state.select(state.columns.map(col).toSeq: _*)
      .unionByName(delta.select(state.columns.map(col).toSeq: _*))
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
