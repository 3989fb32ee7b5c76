package graft.streaming

import org.apache.spark.sql.SparkSession

/** Scale-adaptive shuffle/state partitioning for synchronous stream
  * drains (`Trigger.AvailableNow` over a staged finite feed).
  *
  * Stateful streaming cost has a fixed per-partition-per-batch floor —
  * state-store open/commit, task launch, a sink file — that data volume
  * cannot amortize when the state is small: 32 partitions of kilobyte
  * state pay that floor 32× per micro-batch, and AQE cannot help because
  * adaptive execution does not run inside a streaming plan (the state
  * exchange's partition count is pinned into the checkpoint at first
  * start). Measured on the sketch drains at sf0.1: q128 3.90 → 2.26 s,
  * q215 5.71 → 3.48 s from this sizing alone.
  *
  * So the partition count is decided the way AQE would have decided it,
  * but at plan time: the stateful exchange cannot carry more bytes than
  * the feed itself, so size the partition count by total feed bytes at
  * the session's advisory partition size
  * (`spark.sql.adaptive.advisoryPartitionSizeInBytes`), clamped to
  * [1, session `spark.sql.shuffle.partitions`]. At a 100 TB feed the
  * derived count hits the session ceiling and this is a no-op — the
  * deployment's own shuffle sizing governs, exactly like
  * [[graft.operators.ScaleOut]]'s no-op at real scale. The clamp only
  * ever LOWERS the count, query-locally.
  *
  * `SPARK_GRAFT_STREAM_PARTITIONS` overrides the derivation entirely —
  * the per-deployment knob for a LONG-RUNNING stream (not an
  * AvailableNow drain), whose feed directory at first start says nothing
  * about eventual state volume; the checkpoint pins whatever the first
  * start chose. The value must parse as a positive integer — anything
  * else fails loud at drain start ([[drainPartitions]]) instead of
  * poisoning `spark.sql.shuffle.partitions` with an unplannable value.
  *
  * Two deliberate approximations, documented rather than fixed:
  *
  *  - `feedBytes` measures COMPRESSED on-disk parquet, while the
  *    advisory partition size governs in-flight (decompressed) shuffle
  *    bytes, so the derivation undercounts what AQE would choose for a
  *    mid-sized feed by roughly the compression ratio. Harmless here:
  *    the sketch drains carry kilobytes of state either way, and the
  *    clamp ceiling (the session count) binds long before a factor of
  *    2-4x matters; a deployment that sits exactly at the boundary sets
  *    the env override.
  *  - [[withDrainSized]] mutates the session-global
  *    `spark.sql.shuffle.partitions` for the duration of `body`
  *    (restored in `finally`). Structured Streaming reads the conf at
  *    plan time, so this is the only hook that reaches a drain's state
  *    exchange — there is no per-query repartition that controls state
  *    partitioning. Consequence: drains sized this way must not run
  *    CONCURRENTLY with each other (or with batch queries whose plans
  *    are sensitive to the session count) on one SparkSession — they
  *    would plan under each other's sizing. Results stay correct by the
  *    sketch merge laws; only the sizing cross-talks. The bench/verify
  *    harness runs queries strictly sequentially (the single-writer
  *    discipline this engine assumes throughout).
  */
object StreamShuffle {

  /** Total bytes under `feedDir` (recursive), the drain's whole input. */
  private def feedBytes(spark: SparkSession, feedDir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(feedDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
  }

  /** Partition count for a drain over `feedDir`: env override, else
    * ceil(feedBytes / advisoryPartitionSize) clamped to
    * [1, session shuffle partitions].
    */
  /** Validate the env override: positive integer or a loud, named error
    * (a malformed value would otherwise surface as an obscure plan-time
    * failure on the first drain). Package-visible for the spec.
    */
  private[streaming] def parseOverride(raw: String): Int = {
    val parsed = raw.trim.toIntOption
    require(parsed.exists(_ > 0),
      s"SPARK_GRAFT_STREAM_PARTITIONS must be a positive integer, got '$raw'")
    parsed.get
  }

  def drainPartitions(spark: SparkSession, feedDir: String): Int =
    sys.env.get("SPARK_GRAFT_STREAM_PARTITIONS").map(parseOverride).getOrElse {
      val advisory = spark.conf.get(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "67108864")
      val advisoryBytes =
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(advisory)
      val session = spark.sessionState.conf.numShufflePartitions
      val derived = math.ceil(
        feedBytes(spark, feedDir).toDouble / advisoryBytes.max(1L)).toInt
      math.max(1, math.min(session, derived))
    }

  /** Run a synchronous drain (start + awaitTermination inside `body`)
    * with `spark.sql.shuffle.partitions` sized for `feedDir`; the
    * session value is restored afterwards, so the post-drain readout
    * plans under the session's own (AQE-coalesced) sizing.
    */
  def withDrainSized[A](spark: SparkSession, feedDir: String)(body: => A): A = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      drainPartitions(spark, feedDir).toString)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
