package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.sources.TxTable

/** Streaming EXACTLY-ONCE append into a [[TxTable]] — the table-format
  * sink's streaming half, completing the batch/streaming twin the rest
  * of the engine keeps: each micro-batch commits as ONE transactional
  * append whose log entry carries the Delta-style `txn:<writer>:<batch>`
  * action, so Structured Streaming's at-least-once `foreachBatch`
  * becomes exactly-once in the table —
  *
  *   - a REPLAYED batch (crash after the table commit, before the
  *     checkpoint commit) finds its txn id at or below the writer's
  *     ledger and is skipped whole ([[TxTable.appendTxn]] → None);
  *   - a crash BETWEEN the data write and the log publish leaves an
  *     orphan data directory no reader can see (vacuum reclaims it past
  *     the horizon); the replay writes a fresh uuid directory and
  *     publishes once;
  *   - CONCURRENT batch-table writers under different writer ids stay
  *     safe: appends retry metadata-only past lost rename races and the
  *     txn ledger is per-writer.
  *
  * `compactEvery` runs the log-transacted [[TxTable.compact]] every N
  * batches — snapshot-neutral by the table contract, so a mid-stream
  * compaction is invisible to the drained result (the q92 discipline
  * applied to the table format), and the live-directory count of a
  * long-running ingest stays bounded instead of growing one directory
  * per batch. `maintainEvery` is the heavier sibling — the full
  * [[TxTable.maintain]] OPTIMIZE-daemon pass (compactSmall + forced
  * checkpoint + vacuum + cleanupLog) on the ingest's own cadence, so a
  * long-running stream keeps its OWN table bounded in all three axes
  * (live dirs, data dirs, log files) with no external scheduler; the
  * txn ledger rides the forced checkpoints, so retention never weakens
  * exactly-once (a full replay under a fresh stream checkpoint still
  * lands zero duplicates — spec-pinned). The maintenance horizon must
  * exceed any CONCURRENT writer's in-flight write time (the vacuum
  * contract: crash debris is only distinguishable from an in-flight
  * write by age).
  *
  * Scale shape: per batch one batch-sized parquet write + one driver
  * put-if-absent; the table's log grows one small file per batch, but
  * reads stay bounded — every CheckpointEvery-th commit publishes a log
  * CHECKPOINT, so a month-old one-commit-per-batch ingest replays a
  * bounded tail, not its whole history; nothing ever rewrites prior
  * data.
  */
object TxTableStream {

  /** One micro-batch — public so the crash-replay spec can drive and
    * interrupt it directly.
    */
  def ingestBatch(batch: DataFrame, batchId: Long, tableDir: String,
      writerId: String, compactEvery: Int = 0,
      statsCols: Seq[String] = Nil,
      maintainEvery: Int = 0,
      maintainSmallBytes: Long = 128L * 1024 * 1024,
      maintainHorizonMs: Long = 60L * 60 * 1000): Unit = {
    val s = batch.sparkSession
    val committed = TxTable.appendTxn(s, tableDir, batch, writerId, batchId, statsCols)
    // Compaction/maintenance are BEST-EFFORT layout work (snapshot-
    // neutral by the table contract): a concurrent writer landing
    // between their read and publish aborts them with CommitConflict,
    // which must not fail the streaming query — skip and let a later
    // interval retry (r13 advice). A REPLAYED batch (appendTxn → None)
    // skips them outright: the original attempt already ran them, and
    // replays must be metadata-only.
    if (committed.isDefined && compactEvery > 0 && (batchId + 1) % compactEvery == 0)
      try TxTable.compact(s, tableDir, statsCols)
      catch { case _: TxTable.CommitConflict => () }
    if (committed.isDefined && maintainEvery > 0 && (batchId + 1) % maintainEvery == 0)
      try TxTable.maintain(s, tableDir, maintainSmallBytes, maintainHorizonMs)
      catch { case _: TxTable.CommitConflict => () }
  }

  /** TAIL-FOLLOW a TxTable's commit log as a CDC stream — the table as
    * a STREAMING SOURCE (Delta's readStream-from-table shape, here as
    * the explicit drain loop a scheduler re-runs): every committed
    * version of `srcDir` past the follower's offset is emitted as one
    * per-version change slice ([[TxTable.tableChangesByVersion]] —
    * inserts/deletes tagged `_change_type` + `_commit_version`; a layout
    * commit yields an EMPTY slice, committed all the same so the
    * offset advances) and committed into
    * `sinkDir` EXACTLY-ONCE through the txn ledger with the SOURCE
    * VERSION as the transaction id — the ledger IS the offset store, so
    * there is no separate checkpoint to lose: a crashed or replayed
    * drain re-reads its offset from the sink's own log and re-emits
    * nothing ([[TxTable.appendTxn]] skips at-or-below the ledger).
    * The first drain starts from version 0 (the empty baseline), so the
    * source's initial content arrives as the v1 insert slice.
    *
    * `maxVersions` RATE-LIMITS the drain (Delta's maxFilesPerTrigger
    * shape for a table source): a follower that fell far behind — or
    * one bootstrapping against a long history — catches up at most
    * `maxVersions` commits per invocation instead of unioning its whole
    * backlog into one giant pass, so each invocation's work is bounded
    * and the scheduler's cadence, not the backlog size, sets the batch
    * shape; the ledger-as-offset contract makes the partial drain
    * restartable for free.
    *
    * Returns the source version this drain caught up to (== the source
    * tip when unlimited or the backlog fits the limit; re-invoke until
    * the return equals the tip). Scale shape: one directory-difference
    * scan + one batch-sized transactional append per NEW version — a
    * caught-up follower pays two driver log reads and nothing else.
    */
  def followChanges(spark: SparkSession, srcDir: String, sinkDir: String,
      writerId: String = "follow", maxVersions: Option[Int] = None): Long = {
    maxVersions.foreach(m => require(m >= 1, s"maxVersions must be >= 1, got $m"))
    val tip = TxTable.tipOrZero(spark, srcDir)
    val from = TxTable.lastTxn(spark, sinkDir, writerId).getOrElse(0L)
    val until = maxVersions.map(m => math.min(tip, from + m)).getOrElse(tip)
    var v = from + 1
    while (v <= until) {
      val slice = TxTable.tableChangesByVersion(spark, srcDir, v - 1, v)
      // an empty (layout) slice still commits its txn line, advancing
      // the offset so a restart never rescans it; source-side additive
      // evolution flows through (the feed mirrors the source by design)
      TxTable.appendTxn(spark, sinkDir, slice, writerId, v, allowAdditive = true)
      v += 1
    }
    until
  }

  /** Drain `feedDir` into the table at `tableDir`; returns the tip
    * snapshot after the drain.
    */
  def ingest(
      spark: SparkSession, feedDir: String, feedSchema: StructType,
      tableDir: String, checkpointDir: String,
      writerId: String = "stream",
      maxFilesPerTrigger: Option[Int] = None,
      compactEvery: Int = 0,
      statsCols: Seq[String] = Nil,
      maintainEvery: Int = 0,
      maintainSmallBytes: Long = 128L * 1024 * 1024,
      maintainHorizonMs: Long = 60L * 60 * 1000): DataFrame = {
    var reader = spark.readStream.schema(feedSchema)
    maxFilesPerTrigger.foreach(m => reader = reader.option("maxFilesPerTrigger", m))
    val query = reader.parquet(feedDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, tableDir, writerId, compactEvery, statsCols,
          maintainEvery, maintainSmallBytes, maintainHorizonMs)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    TxTable.snapshot(spark, tableDir)
  }
}
