package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.QuantileSketch

/** The bottom-k quantile sketch ([[QuantileSketch]]) maintained as
  * STREAMING STATE: the same bounded MIN-k aggregate that ranks the batch
  * sketch runs inside a streaming groupBy in Complete mode, so each
  * micro-batch's rows fold into the per-group state and the drained
  * result is the sketch of everything ingested.
  *
  * This is legal — and bit-reproducible — precisely because of the
  * sketch's merge law: bottom-k of a union equals bottom-k of merged
  * bottom-k's, and membership is a pure function of the input SET. So
  * the drained state is IDENTICAL to the single-shot batch sketch over
  * the same rows regardless of how the stream chops them into batches —
  * q113 shares q112's bit-exact oracle verbatim, which is the strongest
  * possible statement of batch-boundary invisibility for a sketch.
  *
  * Scale shape: state per group is the (n, bottom-k sample) pair — k
  * entries, never the group's rows; per batch the map-side partials
  * truncate at k before the state-store exchange, the
  * [[graft.functions.expr.TopKAggregate]] property.
  */
object SketchStream {

  /** Read the drained state, or an EMPTY frame of the state's schema
    * when no micro-batch ever fired: an empty feed directory under
    * AvailableNow triggers zero batches, so foreachBatch never writes
    * `$outDir/state` and a bare read would throw. An empty sketch (zero
    * groups) is the correct drained answer for an empty feed.
    */
  private def drainedState(
      spark: SparkSession, outDir: String, schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$outDir/state")
    if (p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p))
      spark.read.parquet(s"$outDir/state")
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  def quantileSketchStreaming(
      spark: SparkSession, feedDir: String, feedSchema: StructType,
      outDir: String, groupCols: Seq[String], idCol: String, valueCol: String,
      k: Int, salt: String, ps: Seq[(String, Int)],
      maxFilesPerTrigger: Option[Int] = None,
      prep: DataFrame => DataFrame = identity): DataFrame = {
    // state partitions sized by the feed, not the core count
    // ([[StreamShuffle]]): AQE cannot coalesce inside a streaming plan
    val stateSchema = StreamShuffle.withDrainSized(spark, feedDir) {
      var reader = spark.readStream.schema(feedSchema)
      maxFilesPerTrigger.foreach(m => reader = reader.option("maxFilesPerTrigger", m))
      val stream = prep(reader.parquet(feedDir))
      val state = QuantileSketch.sample(stream, groupCols, idCol, valueCol, k, salt)
      // Complete mode: every trigger emits the full current state; the
      // keyed-overwrite sink keeps only the latest — after an
      // AvailableNow drain, that IS the sketch of the whole feed. A
      // replayed final batch rewrites the same state (idempotent). The
      // state dir is a SIBLING of the checkpoint, never its parent — the
      // per-batch overwrite must not delete the stream's own commit log.
      val q = state.writeStream
        .outputMode(OutputMode.Complete)
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("overwrite").parquet(s"$outDir/state")
          ()
        }
        .option("checkpointLocation", s"$outDir/_checkpoint")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      state.schema
    }
    QuantileSketch.quantiles(drainedState(spark, outDir, stateSchema), groupCols, ps)
  }

  /** The KMV distinct sketch ([[graft.operators.Kmv]]) as streaming
    * state — the third mergeable sketch family run as a
    * continuously-maintained service (with the bottom-k sample q113 and
    * the CMS grid q116): the dedup-in-buffer bounded aggregate
    * ([[graft.functions.expr.DistinctMinKString]]) folds each
    * micro-batch into per-group k-smallest-distinct-hash state in
    * Complete mode. Membership is a pure function of the value SET —
    * bottom-k-distinct of a union equals bottom-k-distinct of merged
    * samples — so the drained state is BIT-IDENTICAL to the single-shot
    * batch sketch and q128 shares q126's oracle verbatim. State per
    * group is <= k hex strings; map-side partials truncate at k
    * DISTINCT entries before the state-store exchange.
    */
  def kmvDistinctStreaming(
      spark: SparkSession, feedDir: String, feedSchema: StructType,
      outDir: String, groupCols: Seq[String], valueCol: String,
      k: Int, salt: String,
      maxFilesPerTrigger: Option[Int] = None,
      prep: DataFrame => DataFrame = identity): DataFrame = {
    import org.apache.spark.sql.functions._
    // feed-sized state partitions ([[StreamShuffle]])
    val stateSchema = StreamShuffle.withDrainSized(spark, feedDir) {
      var reader = spark.readStream.schema(feedSchema)
      maxFilesPerTrigger.foreach(m => reader = reader.option("maxFilesPerTrigger", m))
      val stream = prep(reader.parquet(feedDir))
      val state = graft.operators.Kmv.sketch(stream, groupCols, valueCol, k, salt)
      val q = state.writeStream
        .outputMode(OutputMode.Complete)
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("overwrite").parquet(s"$outDir/state")
          ()
        }
        .option("checkpointLocation", s"$outDir/_checkpoint")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      state.schema
    }
    graft.operators.Kmv.distinctEstimate(
      drainedState(spark, outDir, stateSchema), k)
  }

  /** q149's exact-OLS sufficient statistics ([[graft.operators
    * .TrendOls]]) as streaming state — the fourth mergeable-state
    * family member (bottom-k q113, CMS q116, KMV q128): the five long
    * sums (n, Σx, Σy, Σx², Σxy) merge by SUM, so the drained
    * complete-mode state equals the single-shot batch statistics
    * EXACTLY and the finished regression shares q149's oracle verbatim.
    * State per group is five longs — the smallest state of the family;
    * the trend over an unbounded event stream is maintained without
    * ever re-reading it.
    */
  def olsTrendStreaming(
      spark: SparkSession, feedDir: String, feedSchema: StructType,
      outDir: String, maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    // feed-sized state partitions ([[StreamShuffle]])
    val stateSchema = StreamShuffle.withDrainSized(spark, feedDir) {
      var reader = spark.readStream.schema(feedSchema)
      maxFilesPerTrigger.foreach(m => reader = reader.option("maxFilesPerTrigger", m))
      val stream = reader.parquet(feedDir)
      val state = graft.operators.TrendOls.sufficientStats(
        graft.operators.TrendOls.base(stream))
      val q = state.writeStream
        .outputMode(OutputMode.Complete)
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("overwrite").parquet(s"$outDir/state")
          ()
        }
        .option("checkpointLocation", s"$outDir/_checkpoint")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      state.schema
    }
    graft.operators.TrendOls.finish(drainedState(spark, outDir, stateSchema))
  }

  /** [[graft.operators.DecayScore]] as streaming state (q179) — the
    * FIFTH mergeable-state family member: the per-term floor makes each
    * event's decayed contribution a pure function of the event and the
    * FIXED horizon, so partial sums merge by SUM and the drained
    * complete-mode state equals the batch aggregate verbatim.
    */
  def decayScoreStreaming(
      spark: SparkSession, feedDir: String, feedSchema: StructType,
      outDir: String, horizon: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    // feed-sized state partitions ([[StreamShuffle]])
    val stateSchema = StreamShuffle.withDrainSized(spark, feedDir) {
      var reader = spark.readStream.schema(feedSchema)
      maxFilesPerTrigger.foreach(m => reader = reader.option("maxFilesPerTrigger", m))
      val stream = reader.parquet(feedDir)
      val state = graft.operators.DecayScore.aggregate(
        graft.operators.DecayScore.contributions(
          stream.select(col("user_id"),
            col("ts"), round(col("value") * 100).cast("long").as("vc")),
          horizon))
      val q = state.writeStream
        .outputMode(OutputMode.Complete)
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("overwrite").parquet(s"$outDir/state")
          ()
        }
        .option("checkpointLocation", s"$outDir/_checkpoint")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      state.schema
    }
    drainedState(spark, outDir, stateSchema)
  }

  /** The Count-Min counter grid ([[graft.operators.Freq.cmsGrid]]) as
    * streaming state — counters merge by SUM, so the drained
    * complete-mode state equals the batch grid exactly, and the
    * heavy-hitter READOUT then runs as a batch question against the
    * drained state alone. Sketch maintenance and readout are decoupled
    * the way a production heavy-hitters service runs: the stream keeps
    * the state current, consumers query it. Shares q103's bit-exact
    * oracle verbatim (q116).
    *
    * The CANDIDATE VOCABULARY is maintained ALONGSIDE the grid, inside
    * the same streaming aggregation (vocab rows ride the grid's groupBy
    * under sentinel bucket coordinates, `item` carrying the token —
    * structured streaming allows one aggregation per query, and the
    * shared groupBy keeps it at one). Two things follow:
    *
    *  - the readout NEVER re-reads the feed — it joins drained-grid ×
    *    drained-vocabulary, so files landing after the drain cannot
    *    yield candidates whose occurrences are absent from the grid (the
    *    static-feed race of the previous feed-rescan readout is gone:
    *    both halves of the state derive from exactly the drained file
    *    set), and a second full feed pass is saved at scale;
    *  - the candidate state is the DISTINCT vocabulary — a pure set
    *    function of the input, so it drains bit-identically regardless
    *    of batch boundaries, keeping the shared oracle exact. A
    *    Misra–Gries summary would hold fewer entries, but its retention
    *    set is merge-order-dependent and only superset-guaranteed above
    *    n/(capacity+1) — restricting the readout to it can drop
    *    CMS-overshoot items that the batch answer (and oracle) include.
    *    Scale cost matches the batch readout, whose pass 2 already
    *    shuffles the distinct vocabulary (map-side combined, orders of
    *    magnitude smaller than the occurrence stream); the incidental
    *    per-item counts the groupBy produces are DISCARDED at readout so
    *    the answer stays the grid's one-sided estimate.
    */
  def cmsHeavyHittersStreaming(
      spark: SparkSession, feedDir: String, feedSchema: StructType,
      outDir: String, items: DataFrame => DataFrame, phi: Double,
      d: Int = 4, logW: Int = 10,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.expr.HashFunctions.cmsBuckets
    // feed-sized state partitions ([[StreamShuffle]])
    val stateSchema = StreamShuffle.withDrainSized(spark, feedDir) {
      var reader = spark.readStream.schema(feedSchema)
      maxFilesPerTrigger.foreach(m => reader = reader.option("maxFilesPerTrigger", m))
      // ONE pass over the feed for both state halves: each occurrence
      // emits its d grid coordinates plus one sentinel vocabulary row from
      // a single posexplode over (buckets ++ sentinel) — a self-union of
      // the source would share the stream's offsets too, but it scans and
      // re-tokenizes every micro-batch's files twice; appending the
      // sentinel to the bucket array keeps the per-batch feed work single
      val occurrences = items(reader.parquet(feedDir))
        .select(col("item").cast("string").as("item"))
        .filter(col("item").isNotNull)
      val state = occurrences
        .withColumn("bs", cmsBuckets(col("item"), d, logW))
        .select(col("item"), posexplode(concat(col("bs"), array(lit(-1)))))
        .select(
          when(col("pos") < d, col("pos")).otherwise(lit(-1)).as("i"),
          when(col("pos") < d, col("col")).otherwise(lit(-1)).as("bucket"),
          when(col("pos") < d, lit(null).cast("string")).otherwise(col("item")).as("item"))
        .groupBy("i", "bucket", "item").agg(count(lit(1)).as("cnt"))
      val q = state.writeStream
        .outputMode(OutputMode.Complete)
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("overwrite").parquet(s"$outDir/state")
          ()
        }
        .option("checkpointLocation", s"$outDir/_checkpoint")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      state.schema
    }
    val drained = drainedState(spark, outDir, stateSchema)
    graft.operators.Freq.cmsHeavyHittersFromGrid(
      drained.filter(col("item").isNull).select("i", "bucket", "cnt"),
      drained.filter(col("item").isNotNull).select("item"),
      col("item"), phi, d, logW)
  }

  /** DSIR's two-multinomial sufficient statistics ([[graft.operators
    * .Dsir.bucketCounts]]) maintained as STREAMING STATE — the SIXTH
    * mergeable-state family (bottom-k, CMS, KMV, OLS moments, decay
    * scores, now hashed-gram count pairs): per hashed bucket the
    * (target, raw) occurrence counts fold in Complete mode, and because
    * the aggregate is plain sums the drained table is BIT-IDENTICAL to
    * the single-shot batch count table over the same rows — batch
    * boundaries invisible by the merge law, the q113/q128 discipline.
    *
    * This is the deployment shape for selection-as-a-service: the
    * distribution state stays current as documents arrive; scoring any
    * document is then [[graft.operators.Dsir.scoreTable]] (dim-bounded,
    * frozen from the drained counts) plus one broadcast lookup pass —
    * no corpus rescan. State is dim-bounded (one row per touched
    * bucket), map-side-combined before the state-store exchange.
    *
    * Returns the drained (b, ct, cr) table. `target` marks the
    * target-domain rows of the feed (must be derivable from feed
    * columns — a stream cannot join the future).
    */
  def dsirCountsStreaming(
      spark: SparkSession, feedDir: String, feedSchema: StructType,
      outDir: String, target: org.apache.spark.sql.Column,
      textCol: String = "text", n: Int = 4, dim: Int = 1024,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.normText
    import graft.functions.expr.ClassifierFunctions.charGramBuckets
    // feed-sized state partitions ([[StreamShuffle]])
    val stateSchema = StreamShuffle.withDrainSized(spark, feedDir) {
      var reader = spark.readStream.schema(feedSchema)
      maxFilesPerTrigger.foreach(m => reader = reader.option("maxFilesPerTrigger", m))
      val state = reader.parquet(feedDir)
        .select(target.as("is_tgt"),
          explode(charGramBuckets(normText(col(textCol)), n, dim)).as("b"))
        .groupBy("b")
        .agg(sum(when(col("is_tgt"), 1L).otherwise(0L)).as("ct"),
          count(lit(1)).as("cr"))
      val q = state.writeStream
        .outputMode(OutputMode.Complete)
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("overwrite").parquet(s"$outDir/state")
          ()
        }
        .option("checkpointLocation", s"$outDir/_checkpoint")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      state.schema
    }
    drainedState(spark, outDir, stateSchema)
  }

  /** The SERVING half of streaming DSIR selection — the deployment
    * shape [[dsirCountsStreaming]]'s scaladoc promises: the score table
    * is FROZEN (from drained or batch counts — bit-identical by the
    * plain-sum merge law), and each arriving micro-batch pays exactly
    * one broadcast lookup pass ([[graft.operators.Dsir.weightsAgainst]])
    * to score its documents, committing the batch's weight rows into a
    * [[graft.sources.TxTable]] via the txn ledger — so an at-least-once
    * replay adds ZERO duplicate weights (exactly-once, the q213
    * discipline), and the accumulated weight table serves selection at
    * any moment (score-on-arrival, select-at-serve: per-document
    * weights are batch-independent because the score table is frozen,
    * so the drained table's selection is IDENTICAL to the single-shot
    * batch selection over the same rows).
    *
    * Returns the drained weight table snapshot (idCol, n_grams,
    * w_micro); an empty feed yields an empty frame of that schema.
    * Scale shape: per batch one batch-sized kernel scan + a dim-bounded
    * broadcast + one transactional append; the corpus is never
    * re-scanned and no state grows beyond the dim-bounded score table.
    */
  def dsirScoreStreaming(
      spark: SparkSession, feedDir: String, feedSchema: StructType,
      scores: DataFrame, tableDir: String, checkpointDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 4, dim: Int = 1024,
      writerId: String = "dsirscore",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    // the frozen score table is dim-bounded: materialize it once so
    // each micro-batch broadcasts from memory instead of recomputing
    val frozen = scores.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    frozen.count()
    try {
      var reader = spark.readStream.schema(feedSchema)
      maxFilesPerTrigger.foreach(m => reader = reader.option("maxFilesPerTrigger", m))
      val q = reader.parquet(feedDir)
        .writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val w = graft.operators.Dsir.weightsAgainst(
            batch.select(col(idCol), col(textCol)), frozen, idCol, textCol, n, dim)
          graft.sources.TxTable.appendTxn(spark, tableDir, w, writerId, batchId)
          ()
        }
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally frozen.unpersist(blocking = false)
    if (graft.sources.TxTable.versions(spark, tableDir).isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          org.apache.spark.sql.types.StructField(idCol,
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_grams",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("w_micro",
            org.apache.spark.sql.types.LongType))))
    else graft.sources.TxTable.snapshot(spark, tableDir)
  }
}
