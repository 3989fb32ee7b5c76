package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history builder: collapse a change
  * feed (one row per observation of a key's attributes) into versioned
  * dimension rows with `valid_from` / `valid_to` intervals and an
  * `is_current` flag.
  *
  * The reference pipeline rebuilds its dimensions from scratch on every
  * run (`/root/reference/src/etl_pipeline.py:189` re-derives surrogate
  * keys over the full extract); a warehouse ingesting a 100 TB fact
  * stream needs the SCD2 shape instead — attribute history per key, so
  * facts can join the dimension AS OF their event time (see
  * [[AsOf.joinBackward]] for that join).
  *
  * Semantics:
  *   - rows are ordered per key by (`tsCol`, `tieCols`…) — callers must
  *     pass tie-breakers if the feed can carry two observations of one
  *     key at the same timestamp, or version order is nondeterministic;
  *   - consecutive rows whose tracked attributes are unchanged are
  *     COMPRESSED into the earlier version (re-observing the same state
  *     does not open a new version); comparison is null-safe, so a null
  *     attribute equals itself and a change to/from null opens a version;
  *   - `valid_from` = the version's first observation time; `valid_to` =
  *     the next version's `valid_from` (half-open intervals, abutting —
  *     the as-of-join convention); the last version per key has
  *     `valid_to` null and `is_current` true.
  *
  * Scale shape: ONE hash exchange keyed by `keyCols` serves all three
  * window passes (change detection, interval close, currency flag share
  * the same partitioning and sort order, so Catalyst plans one Exchange +
  * one Sort); state per task is bounded by a single key's history. No
  * collect, no self-join — at 1000 executors the feed partitions by key
  * and each history compresses locally.
  */
object Scd {

  /** Build the SCD2 history. Output columns: `keyCols` ++ `attrCols` ++
    * (version, valid_from, valid_to, is_current), one row per (key,
    * version); `version` numbers a key's versions from 1 in time order —
    * (key, version) is a unique, deterministic sort key even when two
    * versions open at the same timestamp.
    */
  def scd2History(
      changes: DataFrame, keyCols: Seq[String], attrCols: Seq[String],
      tsCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "keyCols and attrCols must be non-empty")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((tsCol +: tieCols).map(col): _*)
    val attrs = struct(attrCols.map(col): _*)
    changes
      // null-safe change test: first row per key (_prev null) and any
      // attribute transition — including to/from null — opens a version
      .withColumn("_prev", lag(attrs, 1).over(w))
      .filter(!(col("_prev") <=> attrs))
      .drop("_prev")
      // the filter preserves the key partitioning and sort, so the close
      // and numbering passes reuse the exchange; lead() sees only
      // version-opening rows
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ attrCols).map(col) ++ Seq(
        col("version"), col(tsCol).as("valid_from"), col("valid_to"),
        col("is_current")): _*)
  }

  /** Apply a NEW batch of changes to an existing SCD2 history — the
    * MERGE-shaped daily-ingest path. Rebuilding the dimension from the
    * full feed re-shuffles the entire history every day; here the stored
    * history contributes only each key's CURRENT row (to detect whether
    * the batch actually changes it and to close its interval), closed
    * rows pass through untouched, and only keys present in the batch do
    * any window work.
    *
    * Preconditions (the ingest invariant): every batch observation is
    * STRICTLY after its key's current `valid_from` — slicing the feed by
    * time satisfies this. A batch observation at a closed-row timestamp
    * would rewrite history and is not supported; one at exactly the
    * current `valid_from` is resolved deterministically (the stored
    * version is treated as first) but cannot match a full rebuild, which
    * would order that collision by `tieCols` the stored row no longer
    * carries. Under the invariant, output equals [[scd2History]] over
    * the concatenated feed (the equivalence ScdSpec pins), with the same
    * column contract.
    *
    * Scale shape: one key exchange over the batch (its own window
    * passes), one equi-join against the history's current slice — at
    * 1000 executors the closed history (the bulk of 100 TB) is read and
    * written without a shuffle, or left in place entirely under a table
    * format's MERGE.
    */
  def applyChanges(
      history: DataFrame, batch: DataFrame,
      keyCols: Seq[String], attrCols: Seq[String],
      tsCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    val key = keyCols.map(col)
    val batchKeys = batch.select(key: _*).distinct()
    // the batch compresses against each touched key's CURRENT attributes,
    // injected as a version-0 "seed" observation at its valid_from: a
    // batch that re-observes the current state then opens no version. The
    // seed orders before any batch row at the same timestamp via the
    // _seed flag (0 < 1), so seed-vs-batch order is deterministic even at
    // an exact collision and never consults the (seed-null) tie columns.
    val seed = history.filter(col("is_current"))
      .join(batchKeys, keyCols, "left_semi")
      .select((keyCols ++ attrCols).map(col) ++ Seq(
        col("valid_from").as(tsCol), col("version").as("_base"), lit(0).as("_seed")): _*)
    val feed = batch
      .select((keyCols ++ attrCols :+ tsCol).map(col) ++
        Seq(lit(1).as("_seed"), lit(null).cast("long").as("_base")) ++
        tieCols.map(col): _*)
      .unionByName(seed, allowMissingColumns = true)
    val w = Window.partitionBy(key: _*)
      .orderBy((col(tsCol) +: col("_seed") +: tieCols.map(col)): _*)
    val attrs = struct(attrCols.map(col): _*)
    val merged = feed
      .withColumn("_prev", lag(attrs, 1).over(w))
      .filter(!(col("_prev") <=> attrs))
      .drop("_prev")
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      // versions continue from the stored history: the seed (rank 1 when
      // present) carries the key's current version, so new rows number
      // base + (rank - 1); keys new to the dimension have no seed and
      // number from 1 = their rank
      .withColumn("_rank", row_number().over(w).cast("long"))
      .withColumn("_key_base", max(col("_base")).over(Window.partitionBy(key: _*)))
      .withColumn("version",
        col("_rank") + when(col("_key_base").isNotNull, col("_key_base") - 1L).otherwise(0L))
    val newVersions = merged
      .filter(col("_seed") === 1)
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ attrCols).map(col) ++ Seq(
        col("version"), col(tsCol).as("valid_from"), col("valid_to"), col("is_current")): _*)
    // untouched keys pass through; a touched key's closed rows pass
    // through and its current row re-emits with the interval the seed's
    // lead() computed (null = still current, the batch never changed it)
    val reclosed = merged.filter(col("_seed") === 0)
      .select(keyCols.map(col) :+ col("valid_to").as("_new_to"): _*)
    val touchedHistory = history.join(batchKeys, keyCols, "left_semi")
      .join(reclosed, keyCols, "left")
      .withColumn("valid_to",
        when(col("is_current"), col("_new_to")).otherwise(col("valid_to")))
      .withColumn("is_current", col("is_current") && col("_new_to").isNull)
      .drop("_new_to")
    history.join(batchKeys, keyCols, "left_anti")
      .unionByName(touchedHistory)
      .unionByName(newVersions)
  }
}
