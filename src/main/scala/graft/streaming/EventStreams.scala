package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Batch twins are provided for every streaming operator: at 100 TB the
  * same code path backfills history (batch) and tails the live feed
  * (stream), and the twins double as the DuckDB-oracle-checkable
  * definitions of the streaming semantics.
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Tumbling-window aggregate, batch form: per (hour, event_type) counts
    * and value sums.
    */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))

  /** The same aggregate as an append-mode streaming query with a
    * watermark: windows emit once the watermark (max event time minus
    * `delay`) passes their end — late rows beyond `delay` are dropped,
    * state is bounded. Runs with Trigger.AvailableNow against a parquet
    * DIRECTORY (file stream sources list directories) and returns the
    * materialized result read back from `outDir`.
    */
  def hourlyByTypeStreaming(
      spark: SparkSession, eventsDir: String, outDir: String,
      delay: String = "10 minutes"): DataFrame = {
    val stream = spark.readStream.schema(eventSchema).parquet(eventsDir)
    val agg = stream
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
    val q = agg.writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // explicit schema: a run that emits zero windows writes no data files,
    // and a schema-less read-back of the empty sink dir would throw
    spark.read.schema(StructType(Seq(
        StructField("window_start", StringType), StructField("event_type", StringType),
        StructField("n_events", LongType), StructField("sum_value", DoubleType))))
      .parquet(outDir)
  }

  /** HOPPING-window streaming twin (q147's sliding semantics under a
    * watermark): identical machinery to [[hourlyByTypeStreaming]] with a
    * slide — Spark expands each event to its duration/slide window
    * instances BEFORE the stateful aggregation, so state size is
    * (windows held back by the watermark) × groups, ×4 instances of the
    * tumbling case; append-mode emission is per window INSTANCE (an
    * instance closes when the watermark passes its end, exactly the
    * tumbling rule the oracle's HAVING clause replays).
    */
  def hoppingByTypeStreaming(
      spark: SparkSession, eventsDir: String, outDir: String,
      delay: String = "10 minutes"): DataFrame = {
    val stream = spark.readStream.schema(eventSchema).parquet(eventsDir)
    val agg = stream
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
    val q = agg.writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.schema(StructType(Seq(
        StructField("window_start", StringType), StructField("event_type", StringType),
        StructField("n_events", LongType), StructField("sum_value", DoubleType))))
      .parquet(outDir)
  }

  /** Stream-static enrichment + tumbling aggregate: events joined to a
    * STATIC dimension (key `dimKey`, enrichment column `segCol`, exposed
    * as `segment`) before the hourly window aggregation — the standard
    * enrichment shape: facts stream, dims are slowly-changing tables
    * re-read per micro-batch. The dim is broadcast (small-dim case; a
    * large dim would drop the hint and shuffle by the join key); the
    * static side neither carries nor affects the watermark, so
    * append-mode emission stays governed by the event stream's own
    * event-time watermark, and the join adds NO streaming state — only
    * the window aggregation holds any.
    *
    * One definition for both executions: on a batch frame `withWatermark`
    * is a no-op and this IS the DuckDB-oracle-checkable batch twin; on a
    * streaming frame it is the enrichment stream.
    */
  def enrichedHourly(
      events: DataFrame, dim: DataFrame, dimKey: String, segCol: String,
      delay: String = "10 minutes"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", delay)
      .join(broadcast(dim.select(col(dimKey).as("dim_key"), col(segCol).as("segment"))),
        col("user_id") === col("dim_key"))
      .groupBy(window(col("ts"), "1 hour"), col("segment"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("segment"), col("n_events"), col("sum_value"))

  /** [[enrichedHourly]] as an append-mode streaming run against a parquet
    * directory (Trigger.AvailableNow), result read back from `outDir` —
    * the same harness shape as [[hourlyByTypeStreaming]].
    */
  def enrichedHourlyStreaming(
      spark: SparkSession, eventsDir: String, outDir: String,
      dim: DataFrame, dimKey: String, segCol: String,
      delay: String = "10 minutes"): DataFrame = {
    val stream = spark.readStream.schema(eventSchema).parquet(eventsDir)
    val q = enrichedHourly(stream, dim, dimKey, segCol, delay).writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.schema(StructType(Seq(
        StructField("window_start", StringType), StructField("segment", StringType),
        StructField("n_events", LongType), StructField("sum_value", DoubleType))))
      .parquet(outDir)
  }

  /** Stream-STREAM interval join: purchases paired with the same user's
    * clicks in the preceding `windowMinutes`. The range condition between
    * the two event-time columns plus a watermark on EACH side is what
    * lets Spark bound the join state: a buffered click is evictable once
    * the watermark passes click_ts + window (no future purchase can reach
    * back to it), and symmetric for purchases. Inner join: every
    * qualifying pair emits exactly once when matched, so draining both
    * sides (AvailableNow) yields exactly the batch interval join — which
    * is the DuckDB oracle for q49.
    *
    * Takes the two prepared (projected + watermarked) sides so the same
    * definition runs under MemoryStream in multi-batch tests and under
    * the file-source harness in [[attributionStreaming]].
    */
  def attribution(purchases: DataFrame, clicks: DataFrame, windowMinutes: Int): DataFrame =
    purchases.join(clicks,
        col("user_id") === col("click_user") &&
          col("click_ts") >= col("ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
          col("click_ts") <= col("ts"))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
        col("click_id"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
        col("click_value"))

  /** Purchase/click sides of [[attribution]] as two filtered branches of
    * ONE source (stream self-joins are supported; a second reader would
    * scan the feed twice per micro-batch). Each branch carries its own
    * watermark node — the global watermark is still the min of the two.
    */
  def attributionSides(events: DataFrame, delay: String): (DataFrame, DataFrame) = {
    val e = events.withColumn("ts", col("ts").cast("timestamp"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withWatermark("ts", delay)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"), col("value").as("click_value"))
      .withWatermark("click_ts", delay)
    (purchases, clicks)
  }

  /** [[attribution]] against a parquet directory with Trigger.AvailableNow,
    * result read back from `outDir`. Both sides read the same directory —
    * at scale they'd be separate feeds; the state-bounding math is
    * identical.
    */
  def attributionStreaming(
      spark: SparkSession, eventsDir: String, outDir: String,
      windowMinutes: Int, delay: String = "30 minutes"): DataFrame = {
    val src = spark.readStream.schema(eventSchema).parquet(eventsDir)
    val (purchases, clicks) = attributionSides(src, delay)
    val q = attribution(purchases, clicks, windowMinutes).writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.schema(StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("ts", StringType), StructField("click_id", LongType),
        StructField("click_ts", StringType), StructField("click_value", DoubleType))))
      .parquet(outDir)
  }

  /** LEFT OUTER stream-stream interval join — q49's outer sibling and
    * the harder streaming milestone: matched pairs emit as they join,
    * but an UNMATCHED purchase can only emit (with null click columns)
    * once the click watermark proves no future match exists — the
    * condition caps click_ts at the purchase's ts, so eviction fires
    * when the watermark passes it (Spark's no-data final batch under
    * AvailableNow performs that flush). Purchases still above the final
    * watermark emit nothing: their window is not provably closed — the
    * append-mode rule the oracle encodes (the q36 HAVING discipline
    * applied to outer-join null emission).
    */
  def attributionOuterStreaming(
      spark: SparkSession, eventsDir: String, outDir: String,
      windowMinutes: Int, delay: String = "30 minutes"): DataFrame = {
    val src = spark.readStream.schema(eventSchema).parquet(eventsDir)
    val (purchases, clicks) = attributionSides(src, delay)
    val joined = purchases.join(clicks,
        col("user_id") === col("click_user") &&
          col("click_ts") >= col("ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
          col("click_ts") <= col("ts"),
        "left_outer")
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
        col("click_id"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
        col("click_value"))
    val q = joined.writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.schema(StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("ts", StringType), StructField("click_id", LongType),
        StructField("click_ts", StringType), StructField("click_value", DoubleType))))
      .parquet(outDir)
  }

  /** Streaming exact dedup by event_id with BOUNDED state — the
    * feed-repair operator: at-least-once sources re-deliver, and ingest
    * must drop the re-deliveries. `dropDuplicatesWithinWatermark` keeps a
    * seen-id entry only until the watermark passes its event time plus
    * the delay, so state is bounded by the horizon's id count (a plain
    * streaming `dropDuplicates` grows state forever). The guarantee is
    * correspondingly scoped: a re-delivery arriving with a fresh
    * timestamp AFTER its entry was evicted escapes the dedup —
    * DedupStreamSpec pins both sides of that contract.
    */
  def dedupStreaming(
      spark: SparkSession, eventsDir: String, outDir: String,
      delay: String = "30 minutes"): DataFrame = {
    val stream = spark.readStream.schema(eventSchema).parquet(eventsDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
        col("event_type"), col("value"))
    val q = stream.writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.schema(StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("ts", StringType), StructField("event_type", StringType),
        StructField("value", DoubleType))))
      .parquet(outDir)
  }

  /** One micro-batch of the idempotent append protocol: dedupe the batch
    * within itself, anti-join the keys already present in the sink, and
    * append only the remainder. Factored out so tests can drive it
    * directly; [[idempotentAppendStream]] wires it under `foreachBatch`.
    */
  def idempotentAppendBatch(batch: DataFrame, dataDir: String, keyCol: String): Unit = {
    val spark = batch.sparkSession
    val fresh = batch.dropDuplicates(keyCol)
    // sink existence via the Hadoop filesystem of the PATH — java.io.File
    // is only correct for bare local paths and would silently skip the
    // anti-join (i.e. drop the dedup guarantee) on hdfs://, s3a://, or
    // even file:/ URIs
    val novel =
      if (sinkExists(spark, dataDir))
        fresh.join(
          spark.read.schema(batch.schema).parquet(dataDir).select(keyCol),
          Seq(keyCol), "left_anti")
      else fresh
    novel.write.mode("append").parquet(dataDir)
  }

  private def sinkExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Idempotent parquet APPEND sink via `foreachBatch` — the
    * horizon-UNBOUNDED complement of [[dedupStreaming]]: at-least-once
    * re-deliveries are dropped no matter how late they arrive, because
    * each batch anti-joins the sink's own key set instead of a
    * watermark-bounded state store. The price is reading the sink's key
    * column once per batch (columnar, key-only — at real scale keep the
    * keys in a bucketed side table, or use a table format's MERGE as the
    * commit protocol). Batch writes are append-only files, so a replayed
    * micro-batch after a crash re-runs the same anti-join and appends
    * nothing — idempotent end to end.
    */
  def idempotentAppendStream(
      spark: SparkSession, eventsDir: String, outDir: String,
      keyCol: String = "event_id"): DataFrame = {
    val dataDir = s"$outDir/data"
    val q = spark.readStream.schema(eventSchema).parquet(eventsDir)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        idempotentAppendBatch(batch.toDF(), dataDir, keyCol)
      }
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // a source that yields zero batches never creates the sink directory
    if (sinkExists(spark, dataDir)) spark.read.schema(eventSchema).parquet(dataDir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], eventSchema)
  }

  /** One micro-batch of the KEY-SIDE-TABLE idempotent append protocol —
    * the scale variant of [[idempotentAppendBatch]]: the dedup anti-join
    * reads a compact keys table (`keysDir`: keyCol + a `batch=N`
    * partition per micro-batch) instead of re-scanning the sink's key
    * column, so the DATA files are never re-read on the append path
    * (DedupStreamSpec proves it by corrupting them). Crash safety comes
    * from per-batch OVERWRITE: both data and keys land in `batch=N`
    * directories, a replayed batch rewrites both (its own partial keys
    * are excluded from the anti-join), so every replay converges to the
    * same state — no appended-beside-partial duplicates. At real scale,
    * fold old `batch=` partitions of the keys table into a bucketed base
    * under a table format's transaction (plain [[graft.sources.Compact]]
    * refuses partitioned layouts by design).
    */
  def idempotentAppendBatchKeyed(
      batch: DataFrame, dataDir: String, keysDir: String,
      keyCol: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val fresh = batch.dropDuplicates(keyCol)
    // EXPLICIT schema (key field + the batch partition column): a crash
    // during the very first keys write can leave keysDir existing with
    // zero committed files, and a schemaless read would then throw
    // "unable to infer schema" on every replay — a permanent crash loop
    // on exactly the replay path this sink exists for
    val keysSchema = org.apache.spark.sql.types.StructType(
      Seq(batch.schema(keyCol),
        org.apache.spark.sql.types.StructField("batch", org.apache.spark.sql.types.LongType)))
    val novel =
      if (sinkExists(spark, keysDir))
        fresh.join(
          spark.read.schema(keysSchema).parquet(keysDir)
            // a replayed batch must not anti-join its own partial write
            .filter(col("batch") =!= batchId)
            .select(keyCol),
          Seq(keyCol), "left_anti")
      else fresh
    novel.write.mode("overwrite").parquet(s"$dataDir/batch=$batchId")
    novel.select(col(keyCol)).write.mode("overwrite").parquet(s"$keysDir/batch=$batchId")
  }

  /** [[idempotentAppendStream]] over the key-side-table batch protocol:
    * same horizon-unbounded dedup guarantee, sink data never re-read.
    */
  def idempotentAppendStreamKeyed(
      spark: SparkSession, eventsDir: String, outDir: String,
      keyCol: String = "event_id"): DataFrame = {
    val dataDir = s"$outDir/data"
    val keysDir = s"$outDir/keys"
    val q = spark.readStream.schema(eventSchema).parquet(eventsDir)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        idempotentAppendBatchKeyed(batch.toDF(), dataDir, keysDir, keyCol, batchId)
      }
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // same explicit-schema rationale as the keys read in
    // [[idempotentAppendBatchKeyed]]: never infer from a possibly-partial
    // directory
    val dataSchema = org.apache.spark.sql.types.StructType(
      eventSchema.fields.toSeq :+
        org.apache.spark.sql.types.StructField("batch", org.apache.spark.sql.types.LongType))
    if (sinkExists(spark, dataDir))
      spark.read.schema(dataSchema).parquet(dataDir)
        .select(eventSchema.fieldNames.map(col).toSeq: _*)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], eventSchema)
  }

  /** Gaps-and-islands sessionization, batch form: a session breaks after
    * `gapMinutes` of user inactivity. Window functions only — one shuffle
    * by user_id.
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val gapSec = gapMinutes * 60L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts").cast("timestamp")) -
            unix_millis(col("prev_ts").cast("timestamp")) > gapSec * 1000, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        round(sum(col("value")), 2).as("sum_value"))
  }

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class PendEvent(id: Long, tsUs: Long)
  case class BucketState(levelMicro: Long, lastUs: Long, pending: Seq[PendEvent])
  case class RateDecision(event_id: Long, user_id: Long,
      allowed: Boolean, level_after: Long)

  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L

  /** The token-bucket recurrence over one user's time-ordered events:
    * refill = Δt_us div refillDivUs micro-tokens (clamped at capacity),
    * an event passes iff the level covers `costMicro` and only then
    * draws it down. NONLINEAR (the decision feeds back into the level),
    * so unlike the CUSUM closed form this cannot become a prefix scan —
    * it is the canonical case for ordered per-key stateful execution.
    */
  private def bucketFold(levelMicro0: Long, lastUs0: Long,
      events: Seq[PendEvent], capacityMicro: Long, refillDivUs: Long,
      costMicro: Long, user: Long): (Long, Long, Seq[RateDecision]) = {
    var level = levelMicro0
    var last = lastUs0
    val out = events.sortBy(p => (p.tsUs, p.id)).map { p =>
      val refill = if (last == Long.MinValue) 0L else (p.tsUs - last) / refillDivUs
      level = math.min(capacityMicro, level + refill)
      val allowed = level >= costMicro
      if (allowed) level -= costMicro
      last = p.tsUs
      RateDecision(p.id, user, allowed, level)
    }
    (level, last, out)
  }

  /** BATCH token-bucket rate limiting (q204): the full per-user
    * recurrence over (ts, id)-ordered events. Scale shape: one
    * user-keyed exchange; the per-user fold is inherently sequential
    * (each decision feeds the next level), bounded by the per-user
    * event count — the streaming form (q205) is the unbounded-history
    * deployment shape, holding only (level, last_ts) + the
    * watermark-uncertified tail.
    */
  def rateLimit(events: Dataset[Event], capacityMicro: Long,
      refillDivUs: Long, costMicro: Long): Dataset[RateDecision] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (user, rows) =>
      val pend = rows.map(e => PendEvent(e.event_id, micros(e.ts))).toSeq
      bucketFold(capacityMicro, Long.MinValue, pend,
        capacityMicro, refillDivUs, costMicro, user)._3.iterator
    }
  }

  /** STREAMING token-bucket rate limiting (q205) — the ordered-replay
    * pattern: the recurrence is order-critical and non-commutative, so
    * state buffers the watermark-UNcertified event tail and folds only
    * events at-or-below the watermark (their order can no longer
    * change). Decisions for certified events are final and identical
    * to the batch twin's; events above the final watermark stay
    * unemitted (the q165 emission rule — the oracle replicates the
    * engine's ms-truncated watermark arithmetic exactly). State per
    * user = (level, last_ts) + the bounded uncertified tail.
    */
  def rateLimitStream(events: Dataset[Event], capacityMicro: Long,
      refillDivUs: Long, costMicro: Long): Dataset[RateDecision] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[BucketState, RateDecision](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[BucketState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st = state.getOption
            .getOrElse(BucketState(capacityMicro, Long.MinValue, Seq.empty))
          val pend = st.pending ++ rows.map(e => PendEvent(e.event_id, micros(e.ts)))
          val (ripe, wait) = pend.partition(_.tsUs <= wmUs)
          val (level, last, out) = bucketFold(st.levelMicro, st.lastUs, ripe,
            capacityMicro, refillDivUs, costMicro, user)
          state.update(BucketState(level, last, wait))
          if (wait.nonEmpty) {
            // fire as soon as the watermark can certify the earliest
            // pending event (strict < firing rule ⇒ park 1 ms before),
            // clamped strictly above the current watermark
            state.setTimeoutTimestamp(
              math.max(wait.map(_.tsUs / 1000L).min - 1,
                state.getCurrentWatermarkMs() + 1))
          }
          out.iterator
      }
  }

  /** Run [[rateLimitStream]] with Trigger.AvailableNow against a parquet
    * feed and read back the decisions.
    */
  def rateLimitStreaming(
      spark: SparkSession, eventsDir: String, outDir: String,
      capacityMicro: Long, refillDivUs: Long, costMicro: Long): DataFrame = {
    import spark.implicits._
    val events = spark.readStream.schema(eventSchema).parquet(eventsDir)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val q = rateLimitStream(events, capacityMicro, refillDivUs, costMicro).toDF()
      .writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read
      .schema(org.apache.spark.sql.Encoders.product[RateDecision].schema)
      .parquet(outDir)
  }
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class OpenSessions(sessions: Seq[SessionState])
  case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double)

  /** Run [[sessionizeStream]] against a parquet directory with
    * Trigger.AvailableNow and return the materialized CLOSED sessions
    * read back from `outDir` (the open tail sessions stay in state — in
    * production the stream keeps running; here the trigger drains the
    * directory and stops).
    */
  def sessionizeStreaming(
      spark: SparkSession, eventsDir: String, outDir: String,
      gapMinutes: Int): DataFrame = {
    import spark.implicits._
    val events = spark.readStream.schema(eventSchema).parquet(eventsDir)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val q = sessionizeStream(events, gapMinutes).toDF()
      .writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // explicit schema: a run that closes zero sessions writes no data
    // files, and a schema-less read-back of the empty sink dir would throw
    spark.read
      .schema(org.apache.spark.sql.Encoders.product[Session].schema)
      .parquet(outDir)
  }

  /** Sessionization via Spark's NATIVE `session_window` aggregation —
    * the built-in-first counterpart of [[sessionizeStream]] (preference
    * (a) in the build rules: compose existing operators when semantics
    * allow). The engine merges in-gap events into dynamic windows and, in
    * append mode, emits a session once the watermark passes its window
    * end (last event + gap) — the same deadline rule the custom-state
    * form implements. Use this form when per-session output needs only
    * aggregates; drop to [[sessionizeStream]] when emission or state
    * needs custom logic.
    */
  def sessionizeWindowStreaming(
      spark: SparkSession, eventsDir: String, outDir: String,
      gapMinutes: Int): DataFrame = {
    val stream = spark.readStream.schema(eventSchema).parquet(eventsDir)
    val agg = stream
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "30 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))
    val q = agg.writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.schema(StructType(Seq(
        StructField("user_id", LongType), StructField("session_start", StringType),
        StructField("session_end", StringType), StructField("n_events", LongType),
        StructField("sum_value", DoubleType))))
      .parquet(outDir)
  }

  /** Streaming sessionization with explicit state — the
    * `flatMapGroupsWithState` form of [[sessionize]].
    *
    * Per-user state holds ALL sessions still inside the watermark horizon
    * as a start-sorted interval list; each batch folds the (sorted)
    * existing sessions and incoming events through one gaps-and-islands
    * merge, so a watermark-legal late event can extend a session on
    * either side or BRIDGE two previously-separate sessions — exactly the
    * batch twin's semantics, incrementally. A session is emitted only
    * once the watermark REACHES `session_end + gap` (>=, the same
    * append-mode eviction rule as Spark's native `session_window`): only
    * then can no legal event still extend or bridge it. Closing on the
    * mere existence of a
    * later session would be premature — a late bridge event may yet merge
    * the two. State is bounded: sessions whose gap deadline the watermark
    * passed are emitted and dropped, so per user it holds only the
    * sessions of the last (watermark delay + gap) window; both the data
    * and timeout paths share the single merge-evict-emit code path.
    */
  def sessionizeStream(events: Dataset[Event], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSessions, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[OpenSessions]) =>
          val wm = state.getCurrentWatermarkMs()
          val existing = state.getOption.map(_.sessions).getOrElse(Seq.empty)
          val incoming = rows.map(e =>
            SessionState(e.ts.getTime, e.ts.getTime, 1, e.value)).toSeq
          val merged = (existing ++ incoming).sortBy(s => (s.start, s.last))
            .foldLeft(List.empty[SessionState]) {
              case (cur :: acc, s) if s.start - cur.last <= gapMs =>
                SessionState(cur.start, math.max(cur.last, s.last),
                  cur.n + s.n, cur.sum + s.sum) :: acc
              case (acc, s) => s :: acc
            }.reverse
          // emit iff the watermark has REACHED the gap deadline (<=) —
          // the native session_window eviction rule at ms granularity
          // (SessionizeStreamSpec pins both forms agreeing at the exact
          // tie). Timeouts fire only when timeoutTimestamp < wm, so the
          // timeout is set one ms BEFORE the deadline: it then fires as
          // soon as wm >= deadline, matching the data-path predicate.
          val (expired, open) = merged.partition(_.last + gapMs <= wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(OpenSessions(open))
            // earliest remaining deadline minus the firing slack, clamped
            // strictly above the watermark (Spark rejects timeouts at/below).
            // Residual: when a deadline D == wm + 1 exactly, the clamp
            // parks the timeout AT D and the strict firing rule
            // (timeout < wm') cannot trigger at wm' == D — if the
            // watermark then stops precisely on D forever and the user
            // never sees another event, emission waits for the next
            // watermark movement (native session_window scans state
            // per-batch and has no such window). Reaching it needs
            // adversarial 1 ms watermark steps; any data or further
            // watermark progress resolves it through the <= partition
            // above.
            state.setTimeoutTimestamp(
              math.max(open.map(_.last + gapMs).min - 1, wm + 1))
          }
          expired.iterator.map(s =>
            Session(user, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum))
      }
  }
}
