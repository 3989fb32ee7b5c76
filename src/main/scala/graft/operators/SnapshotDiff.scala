package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot (dataset-version) diff — the CDC primitive a versioned corpus
  * pipeline needs between any two states of the same table: which rows
  * were added, removed, or changed. The reference pipeline reloads its
  * tables wholesale on every run (`/root/reference/src/etl_pipeline.py`
  * re-inserts from scratch); at 100 TB a reload is off the table and the
  * diff IS the ingest: downstream consumers (indexes, dedup keep-lists,
  * training mixtures) apply the delta, not the snapshot.
  *
  * Shape: each side is reduced to (key, content digest) IN THE SCAN
  * STAGE, so the one full-outer key exchange moves ids + 8 bytes per row
  * — never the document payloads. The digest is xxhash64 over the
  * `to_json` of the compared struct: JSON keeps field names, so a value
  * sliding between adjacent columns — ("a", null) vs (null, "a") — or
  * splitting across them — ("ab", "") vs ("a", "b") — changes the
  * serialization and therefore the digest, the two ambiguities a plain
  * multi-arg hash (which skips nulls and concatenates) would miss. A
  * digest collision misclassifies only if it happens on the SAME key's
  * two versions (2^-64 per changed row, not a birthday bound over the
  * corpus).
  *
  * `includeUnchanged` defaults to false: the changed-set is the output a
  * pipeline acts on, and materializing the unchanged 99% of a 100 TB
  * corpus to say "unchanged" is the classic CDC anti-pattern.
  */
object SnapshotDiff {

  /** Row-level diff of two snapshots keyed by `idCols`; `compareCols`
    * defaults to every column the two sides share minus the keys. Keys
    * must be unique within each snapshot (a duplicated key makes "the
    * row changed" ill-posed).
    *
    * `compareCols` must serialize deterministically under `to_json`:
    * MAP-typed columns render in entry-iteration order, so two
    * semantically equal maps with different entry order digest
    * differently and classify as `changed` — a FALSE POSITIVE (the safe
    * direction: no real change is ever missed, but order-churned maps
    * re-report). Canonicalize maps before diffing
    * (`array_sort(map_entries(m))` as the compare column) or key the
    * comparison on scalar/struct/array columns.
    */
  def diff(
      oldSnap: DataFrame, newSnap: DataFrame, idCols: Seq[String],
      compareCols: Seq[String] = Nil,
      includeUnchanged: Boolean = false): DataFrame = {
    require(idCols.nonEmpty, "idCols must be non-empty")
    val cmp =
      if (compareCols.nonEmpty) compareCols
      else oldSnap.columns.filter(newSnap.columns.contains)
        .filterNot(idCols.contains).toSeq
    require(cmp.nonEmpty, "no comparable columns between the snapshots")
    def digested(df: DataFrame, tag: String): DataFrame =
      df.select(idCols.map(col) :+
        xxhash64(to_json(struct(cmp.map(col): _*))).as(s"__digest_$tag"): _*)
    val joined = digested(oldSnap, "old")
      .join(digested(newSnap, "new"), idCols, "full_outer")
    val status = when(col("__digest_old").isNull, lit("added"))
      .when(col("__digest_new").isNull, lit("removed"))
      .when(col("__digest_old") =!= col("__digest_new"), lit("changed"))
      .otherwise(lit("unchanged"))
    val classified = joined.select(idCols.map(col) :+ status.as("status"): _*)
    if (includeUnchanged) classified
    else classified.filter(col("status") =!= "unchanged")
  }
}
