package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftBridge, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.TxTable

/** `spark.readStream.format("txtable")` — the transactional table as a
  * REAL Structured Streaming source (the Delta readStream-from-table
  * shape; [[TxTableStream.followChanges]] remains the explicit
  * scheduler-driven drain loop, this is the engine-driven half): the
  * commit log's VERSION NUMBER is the stream offset, each micro-batch
  * reads the per-version change slices in `(start, end]`
  * ([[TxTable.tableChangesByVersion]] — inserts/deletes tagged
  * `_change_type` + `_commit_version`; layout commits contribute empty
  * slices whose offset still advances), and Structured Streaming's own
  * offset log provides exactly-once delivery to any checkpointed sink.
  * A restart resumes from the checkpoint: versions at or below the
  * committed offset are never re-emitted.
  *
  * Options: `path` (the table directory — or pass it to `.load(path)`),
  * `startingVersion` (the first version the feed emits — Delta's
  * startingVersion; default 1, the whole feed from the empty baseline;
  * validated at setup against the tip — at most tip+1, the empty feed
  * that waits for the next commit), `startingTimestamp`
  * (`yyyy-MM-dd HH:mm:ss[.fff]`, interpreted in the SESSION timezone —
  * `spark.sql.session.timeZone`, UTC under the engine's defaults —
  * matching the txtable()/txgroup() TVF TIMESTAMP literals: the
  * feed begins with the first version whose IN-COMMIT timestamp is
  * strictly after the cut — resolved through [[TxTable.versionAt]]'s
  * O(log tip) binary search; a cut predating retained history yields
  * the whole feed), and
  * `maxVersionsPerTrigger` (Delta's maxFilesPerTrigger shape: a
  * follower that fell behind catches up at most this many commits per
  * micro-batch instead of unioning its whole backlog into one giant
  * plan — enforced through the ADMISSION-CONTROL seam, so the engine
  * hands this source the true committed offset on every trigger,
  * restarts included, and `Trigger.AvailableNow` drains the whole
  * backlog as a SEQUENCE of clamped batches to the tip captured at
  * query start).
  *
  * Contract notes, both the documented Delta trades: log retention
  * ([[TxTable.cleanupLog]]) must cover the consumer's maximum lag —
  * a slice whose entries were reclaimed fails the batch informatively;
  * and a slice is a NET per-commit change (directory-difference scan),
  * so exchange per batch is bounded by the touched directories' rows,
  * never the table.
  *
  * Altitude: the V1 `Source`/`StreamSourceProvider` seam — the same
  * public extension point Spark's own FileStreamSource sits on
  * (MicroBatchExecution drives getOffset/getBatch/commit); nothing
  * below it is touched, and the per-batch frame is the stock
  * [[TxTable.tableChangesByVersion]] plan re-tagged streaming.
  */
final class TxTableSource(
    spark: SparkSession,
    dir: String,
    maxVersionsPerTrigger: Option[Int],
    startingVersion: Long = 1L) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  maxVersionsPerTrigger.foreach(m =>
    require(m >= 1, s"maxVersionsPerTrigger must be >= 1, got $m"))
  require(startingVersion >= 1L,
    s"startingVersion must be >= 1, got $startingVersion")

  override val schema: StructType = TxTableSource.changeSchema(spark, dir)

  /** Trigger.AvailableNow pins the drain target at query start —
    * implementing [[org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow]]
    * DIRECTLY keeps rate limiting multi-batch: the engine keeps
    * triggering until [[latestOffset]] reaches this captured tip,
    * maxVersionsPerTrigger versions per batch. (The wrapper Spark would
    * otherwise install captures ONE offset result and would stop a
    * rate-limited drain after a single batch.)
    */
  @volatile private var availableTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = Some(TxTable.tipOrZero(spark, dir))

  private def versionOf(o: OffsetV1): Long = o match {
    case LongOffset(v) => v
    case other => other.json.trim.toLong
  }

  // --- admission control: the engine hands this source the COMMITTED
  // offset on every trigger (restarts included — it deserializes the
  // checkpoint through deserializeOffset below), so the rate limit
  // clamps from the true start with no source-side offset bookkeeping.
  // The initial offset encodes startingVersion (slices are (start, end],
  // so the first emitted version is exactly startingVersion); the
  // default 1 yields the whole feed from the empty baseline.
  override def initialOffset(): OffsetV2 = LongOffset(startingVersion - 1L)

  override def deserializeOffset(json: String): OffsetV2 =
    LongOffset(json.trim.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val tip = availableTarget.getOrElse(TxTable.tipOrZero(spark, dir))
    if (tip <= 0) return null
    // a null start is the cold start (the engine does not route v1
    // sources through initialOffset on this path): begin at the
    // configured startingVersion
    val from = Option(start).map {
      case LongOffset(v) => v
      case o => o.json().trim.toLong
    }.getOrElse(startingVersion - 1L)
    // a feed positioned AT the tip (startingVersion = tip+1, validated at
    // setup) has nothing yet: report no-data instead of an offset past
    // the tip, which would fail the first batch inside the range check
    if (from >= tip) return null
    val end = maxVersionsPerTrigger.map(m => math.min(tip, from + m)).getOrElse(tip)
    LongOffset(math.max(end, from))
  }

  /** The non-admission-control face of the same answer (kept for any
    * caller driving the V1 interface directly; the engine itself calls
    * [[latestOffset]] because this source declares admission control).
    */
  override def getOffset: Option[OffsetV1] = {
    val tip = TxTable.tipOrZero(spark, dir)
    if (tip <= 0) None else Some(LongOffset(tip))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(versionOf).getOrElse(startingVersion - 1L)
    val to = versionOf(end)
    // slices (from, to] — from = None is the cold start, and version 0
    // is the EMPTY table, so the initial content arrives as the first
    // version's insert slice (the followChanges baseline). Select in
    // declared-schema order (the engine matches by position), PADDING
    // columns the window predates with typed nulls: a batch entirely
    // before an additive evolution lacks the new columns the
    // stream-start schema declares.
    val raw = TxTable.tableChangesByVersion(spark, dir, from, to)
    val df = raw.select(schema.fields.toIndexedSeq.map { f =>
      if (raw.columns.contains(f.name)) col(f.name)
      else org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
    }: _*)
    GraftBridge.streamingFrameOf(spark, df)
  }

  override def commit(end: OffsetV1): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"TxTableSource[$dir]"
}

/** Registers short name `txtable` (META-INF/services) so
  * `spark.readStream.format("txtable").load(path)` AND
  * `df.writeStream.format("txtable").start(path)` resolve with no
  * class-name spelling ([[TxTableSinkProvider]] carries the sink half).
  */
final class TxTableSourceProvider extends StreamSourceProvider
    with TxTableSinkProvider with DataSourceRegister {

  override def shortName(): String = "txtable"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "txtable source needs a table directory: .load(path) or .option(\"path\", ...)"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "txtable source derives its schema from the table's log; do not set one")
    (shortName(),
      TxTableSource.changeSchema(sqlContext.sparkSession, pathOf(parameters)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val path = pathOf(parameters)
    require(!(parameters.contains("startingVersion") &&
        parameters.contains("startingTimestamp")),
      "set startingVersion OR startingTimestamp, not both")
    // startingTimestamp: the feed begins with the first version whose
    // IN-COMMIT timestamp is strictly after the cut (versionAt's exact
    // complement); a timestamp predating retained history = whole feed
    val startingVersion = parameters.get("startingVersion")
      .map { raw =>
        val sv = raw.trim.toLong
        // validate at SETUP like the startingTimestamp path: a version
        // past tip+1 would otherwise surface mid-stream as a confusing
        // range error from the first batch's change read (tip+1 itself
        // is legal — an empty feed that waits for the next commit)
        val tip = graft.sources.TxTable.tipOrZero(spark, path)
        require(sv >= 1 && sv <= tip + 1,
          s"startingVersion $sv is past the committed history of $path " +
            s"(tip $tip) — the feed can start at most at tip+1 (${tip + 1})")
        sv
      }
      .orElse(parameters.get("startingTimestamp").map { s =>
        // interpreted in the SESSION timezone (spark.sql.session.timeZone
        // — UTC under the engine's defaults), matching the txtable()/
        // txgroup() TVF TIMESTAMP literals so the two AS-OF surfaces
        // cannot resolve the same wall-clock string differently
        val zone = java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone)
        val ms = java.time.LocalDateTime.parse(s.trim.replace(' ', 'T'))
          .atZone(zone).toInstant.toEpochMilli
        try graft.sources.TxTable.versionAt(spark, path, ms) + 1L
        catch {
          case _: IllegalArgumentException
              if graft.sources.TxTable.versions(spark, path).headOption
                .contains(1L) =>
            // the cut simply predates the table: the whole feed
            1L
          case e: IllegalArgumentException =>
            // the cut predates RETAINED history on a cleaned log — a
            // version-1 feed would fail mid-stream with a missing-entry
            // error; fail at setup with guidance instead (the one log
            // listing here is setup-time, never the read path)
            throw new IllegalArgumentException(
              s"startingTimestamp '$s' predates the retained history of $path " +
                "(cleanupLog reclaimed the early entries) — pass an explicit " +
                "startingVersion at or above the earliest retained version, or " +
                "bootstrap from a snapshot and follow from its version", e)
        }
      })
      .getOrElse(1L)
    new TxTableSource(spark, path,
      parameters.get("maxVersionsPerTrigger").map(_.trim.toInt),
      startingVersion)
  }
}

object TxTableSource {

  /** The stream's schema: the table's LOGICAL snapshot schema plus the
    * change-feed tags — fixed at stream start (the usual Structured
    * Streaming contract; restart the query to pick up an evolved
    * schema, the Delta source rule).
    */
  def changeSchema(spark: SparkSession, dir: String): StructType =
    TxTable.snapshot(spark, dir).schema
      .add("_change_type", StringType).add("_commit_version", LongType)
}
