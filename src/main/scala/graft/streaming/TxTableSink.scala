package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftBridge, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.StreamSinkProvider
import org.apache.spark.sql.streaming.OutputMode

import graft.sources.TxTable

/** `df.writeStream.format("txtable")` — the transactional table as a
  * REAL Structured Streaming sink (the write half of [[TxTableSource]]'s
  * surface; Delta's writeStream-to-table shape): every micro-batch
  * commits one txn-ledgered append with the BATCH ID as the transaction
  * id, so delivery is EXACTLY-ONCE without user-written `foreachBatch`
  * plumbing — a restarted query re-offers completed batches and the
  * table's own ledger skips them whole ([[TxTable.appendTxn]] at or
  * below the writer's high-water mark commits nothing).
  *
  * Options: `path` (the table directory — or `.start(path)`),
  * `writerId` (the ledger key; DEFAULT is the streaming QUERY ID — the
  * Delta rule for its SetTransaction keying, so two distinct queries
  * feeding one table never collide on the ledger and silently drop
  * each other's batches; the query id persists in the stream
  * checkpoint, so restarts keep their ledger continuity. Set it
  * EXPLICITLY for the stronger survives-a-LOST-checkpoint guarantee —
  * a fresh-checkpoint rerun under the same explicit writerId re-offers
  * every batch and the table's ledger skips them all, at the user's
  * promise that this writer is the feed's only producer under that
  * id. A table whose ledger was written under a DIFFERENT key — e.g.
  * a constant one — must keep passing that key explicitly: a new
  * default key starts a fresh ledger line and cannot see the old
  * marks), `statsCols` (comma-separated columns to
  * record per-directory/per-file min/max+null stats for at write time
  * — the pruning surface), `allowAdditive` (additive schema evolution
  * on a batch carrying new columns, the Delta mergeSchema shape),
  * `compactEvery` (best-effort log-transacted compaction every N
  * batches — snapshot-invisible by the table contract; a concurrent
  * writer's CommitConflict skips it, a later interval retries).
  *
  * Append output mode only: the table is an append-shaped log
  * (aggregation state belongs in `mapGroupsWithState`/`foreachBatch`
  * upstream, not in a table sink replaying Complete mode's full result
  * every batch).
  *
  * Altitude: the V1 `Sink`/`StreamSinkProvider` seam — the same public
  * extension point the source half sits on; the incoming micro-batch
  * frame re-binds as a batch frame through the one
  * `internalCreateDataFrame` bridge call ([[GraftBridge.batchFrameOf]]
  * — the documented V1 sink trap), and everything below is the stock
  * [[TxTable.appendTxn]] write path.
  */
final class TxTableSink(
    dir: String,
    writerIdOpt: Option[String],
    statsCols: Seq[String],
    allowAdditive: Boolean,
    compactEvery: Int) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    // default ledger key: the QUERY id (the local property StreamExecution
    // sets around every batch) — distinct queries get distinct ledgers,
    // so a second default-keyed query writing this table cannot replay
    // into the first's high-water mark and silently drop its batches
    val writerId = writerIdOpt.getOrElse {
      val q = spark.sparkContext.getLocalProperty("sql.streaming.queryId")
      require(q != null && q.nonEmpty,
        "txtable sink could not resolve the streaming query id for its " +
          "default ledger key — pass .option(\"writerId\", ...) explicitly")
      q
    }
    val batch = GraftBridge.batchFrameOf(spark, data)
    val committed =
      TxTable.appendTxn(spark, dir, batch, writerId, batchId, statsCols,
        allowAdditive)
    // best-effort layout work, NEVER a query failure (the batch above
    // already committed): any maintenance error — a conflict, a
    // FileNotFound racing a concurrent vacuum — skips this interval
    if (committed.isDefined && compactEvery > 0 && (batchId + 1) % compactEvery == 0)
      try TxTable.compact(spark, dir, statsCols)
      catch { case scala.util.control.NonFatal(_) => () }
  }

  override def toString: String = s"TxTableSink[$dir]"
}

/** The sink half of the `txtable` short name ([[TxTableSourceProvider]]
  * carries the source half and the META-INF/services registration —
  * Spark resolves both through the same DataSourceRegister row).
  */
trait TxTableSinkProvider extends StreamSinkProvider {

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"txtable sink is append-only (got $outputMode): the table is an " +
        "append-shaped log — aggregate upstream (foreachBatch / " +
        "mapGroupsWithState), not in the table sink")
    require(partitionColumns.isEmpty,
      "txtable sink does not partition by columns; use statsCols for the " +
        "pruning surface (file-level stats prune finer than directories)")
    val dir = parameters.getOrElse("path", throw new IllegalArgumentException(
      "txtable sink needs a table directory: .start(path) or .option(\"path\", ...)"))
    val writerIdOpt = parameters.get("writerId")
    writerIdOpt.foreach(w => require(w.nonEmpty && !w.contains(":"),
      s"writerId must be non-empty and colon-free: '$w'"))
    val statsCols = parameters.get("statsCols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val allowAdditive = parameters.get("allowAdditive").exists(_.trim.toBoolean)
    val compactEvery = parameters.get("compactEvery").map(_.trim.toInt).getOrElse(0)
    new TxTableSink(dir, writerIdOpt, statsCols, allowAdditive, compactEvery)
  }
}
