package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture MERGE — apply an upsert/delete log to a TYPE-1
  * snapshot with last-writer-wins semantics: the `MERGE INTO` of the
  * lakehouse table formats, reduced to its distributed core. The
  * versioned sibling is [[Scd.applyChanges]] (type-2 history); this is
  * the current-state table a serving layer reads.
  *
  * Per key, the log's LATEST row (by `orderCols`, descending, e.g.
  * (ts, seq) — seq breaks exact-timestamp ties deterministically) wins:
  * op `U` replaces the snapshot row wholesale (or inserts a key the
  * snapshot lacks), op `D` removes it. Earlier log rows for the key are
  * superseded — an upsert-then-delete deletes, a delete-then-upsert
  * resurrects, exactly the Debezium/OLTP-capture compaction rule.
  *
  * Reference scope: the reference's idempotent re-runs rebuild tables
  * from scratch (`src/etl_pipeline.py:247-315`); this is the
  * incremental form those rebuilds become at scale.
  *
  * Scale shape: the LWW window shuffles only the LOG (batch-sized, by
  * key); the snapshot pays one left-anti probe against the touched-key
  * set — delta-sized, so Spark broadcasts it when it fits, and a
  * bucketed-by-key stored snapshot ([[graft.sources.Bucketed]]) makes
  * it exchange-free. The corpus is never windowed or re-sorted.
  */
object Cdc {

  /** Apply `log` to `snapshot`. Contract: `log` carries the snapshot's
    * exact columns (keys + attributes) plus `opCol` (values 'U'/'D';
    * anything else fails fast) and `orderCols`; the result has the
    * snapshot's schema. Upserts are whole-row replacements.
    */
  def applyLog(
      snapshot: DataFrame, log: DataFrame,
      keyCols: Seq[String], orderCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    require(!snapshot.columns.contains(opCol), s"snapshot must not carry $opCol")
    val winners = latestWinners(log, snapshot.columns.toSeq, keyCols, orderCols, opCol)
    val untouched = snapshot.join(
      winners.select(keyCols.map(col): _*), keyCols, "left_anti")
    untouched.unionByName(
      winners.filter(col(opCol) === "U")
        .select(snapshot.columns.map(col).toSeq: _*))
  }

  /** The per-key LWW compaction of a CDC log alone: the latest row per
    * key (by `orderCols` descending), ops validated, projected to
    * `opCol` + `valueCols` — the building block [[applyLog]] anti-joins
    * against, exposed so directory-granularity writers (the
    * transactional table's per-directory MERGE rewrite) can compute the
    * winner set ONCE and probe many snapshot slices against it.
    */
  def latestWinners(
      log: DataFrame, valueCols: Seq[String],
      keyCols: Seq[String], orderCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty, "keys and order columns required")
    val missing = (valueCols.toSet ++ orderCols + opCol) -- log.columns
    require(missing.isEmpty, s"log is missing columns: $missing")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col(_).desc): _*)
    log
      .select(when(col(opCol).isin("U", "D"), col(opCol))
        .otherwise(raise_error(concat(lit("Cdc: unknown op "), col(opCol)))).as(opCol)
        +: (valueCols ++ orderCols.filterNot(valueCols.contains))
          .map(col).toSeq: _*)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select((opCol +: valueCols).map(col): _*)
  }
}
