package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftBridge, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

import graft.sources.TxGroup

/** `df.writeStream.format("txgroup")` — the MULTI-TABLE transaction
  * group as a Structured Streaming sink (the symmetric surface to the
  * single-table `txtable` sink, riding [[TxGroup.appendMany]]'s
  * ledger): every micro-batch ROUTES rows to member tables by a
  * discriminator column and commits ALL slices as ONE atomic,
  * txn-ledgered entry with the batch id as the transaction id — a
  * multiplexed CDC/event feed lands exactly-once AND skew-free (no
  * version ever shows one member's slice of a batch without the
  * others'; a restarted or fresh-checkpoint replay under the same
  * explicit writerId skips whole batches at the group's own ledger).
  * This is the fan-out-by-column deployment shape a per-table sink
  * composition cannot give: N independent sinks each keep their own
  * offsets and one can run ahead of another across a crash.
  *
  * Options: `path` (the group directory — or `.start(path)`),
  * `tableCol` (default `table`: the string column whose value names
  * each row's member table; dropped from the written rows), `writerId`
  * (the ledger key; default = the streaming QUERY id, exactly the
  * `txtable` sink's rule — set it explicitly for the
  * survives-a-lost-checkpoint guarantee), `statsCols` (comma-separated
  * columns recorded as per-directory/per-file min/max+null stats on
  * EVERY member slice that carries them — the multiplexed feed shares
  * one schema, so one list serves all tables), `allowAdditive`
  * (additive schema evolution per member table).
  *
  * Append output mode only, like the single-table sink. The per-batch
  * member set is DATA-DRIVEN (the distinct discriminator values, a
  * member-count-bounded collect); a batch with zero rows commits
  * nothing and the ledger's monotone skip-rule handles the gap.
  */
final class TxGroupSink(
    dir: String,
    tableCol: String,
    writerIdOpt: Option[String],
    statsCols: Seq[String],
    allowAdditive: Boolean) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    val writerId = writerIdOpt.getOrElse {
      val q = spark.sparkContext.getLocalProperty("sql.streaming.queryId")
      require(q != null && q.nonEmpty,
        "txgroup sink could not resolve the streaming query id for its " +
          "default ledger key — pass .option(\"writerId\", ...) explicitly")
      q
    }
    val batch = GraftBridge.batchFrameOf(spark, data)
    require(batch.columns.contains(tableCol),
      s"txgroup sink routes rows by column '$tableCol', which the incoming " +
        s"frame lacks (columns: ${batch.columns.mkString(", ")}) — set " +
        ".option(\"tableCol\", ...) to the discriminator column")
    // pin for the distinct-probe + per-slice writes (one materialization,
    // member-count-bounded driver result); released before returning
    batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val tables0 = batch.select(tableCol).distinct()
        .collect().map(_.getString(0))
      // fail LOUD before any write: a null route would otherwise NPE in
      // the sort (and a filter on === null matches nothing, so the rows
      // would silently vanish from the batch)
      require(!tables0.contains(null),
        s"txgroup sink batch $batchId carries NULL in discriminator " +
          s"column '$tableCol' — every row must name its member table")
      val tables = tables0.sorted
      if (tables.nonEmpty) {
        val writes = tables.toSeq.map { t =>
          val slice = batch.filter(col(tableCol) === t).drop(tableCol)
          t -> slice
        }
        val stats =
          if (statsCols.isEmpty) Map.empty[String, Seq[String]]
          else tables.toSeq.map(t => t -> statsCols).toMap
        TxGroup.appendMany(spark, dir, writes, stats,
          allowAdditive = allowAdditive, txn = Some((writerId, batchId)))
      }
    } finally batch.unpersist(blocking = false)
  }

  override def toString: String = s"TxGroupSink[$dir]"
}

/** Registers short name `txgroup` (META-INF/services) so
  * `df.writeStream.format("txgroup").start(path)` resolves with no
  * class-name spelling.
  */
final class TxGroupSinkProvider extends StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "txgroup"

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"txgroup sink is append-only (got $outputMode): the group is an " +
        "append-shaped log — aggregate upstream, not in the sink")
    require(partitionColumns.isEmpty,
      "txgroup sink does not partition by columns; rows route to member " +
        "tables by tableCol, and statsCols is the pruning surface")
    val dir = parameters.getOrElse("path", throw new IllegalArgumentException(
      "txgroup sink needs a group directory: .start(path) or .option(\"path\", ...)"))
    val tableCol = parameters.getOrElse("tableCol", "table")
    val writerIdOpt = parameters.get("writerId")
    writerIdOpt.foreach(w => require(w.nonEmpty && !w.contains(":"),
      s"writerId must be non-empty and colon-free: '$w'"))
    val statsCols = parameters.get("statsCols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val allowAdditive = parameters.get("allowAdditive").exists(_.trim.toBoolean)
    new TxGroupSink(dir, tableCol, writerIdOpt, statsCols, allowAdditive)
  }
}
