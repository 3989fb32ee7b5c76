package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.functions._

/** Deterministic sharded training export — the hand-off format between
  * the data pipeline and a training job's data loader. Shard membership
  * is CONTENT-addressed: row → shard = pmod(xxhash64(key), shards),
  * a pure function of the key — never of partition layout, cluster
  * size, or run order — so re-exports reproduce identical shards,
  * loaders can cache/resume per shard, and two exports of the same
  * corpus diff shard-by-shard.
  *
  * Layout: `dir/shard=K/part-*.parquet`, one directory per shard.
  * `repartition(shards, col(shard))` routes each shard's rows into one
  * task (hash collisions of shard ids may co-locate two shards in one
  * task — `partitionBy` still splits them into their own directories),
  * and `sortWithinPartitions` makes the row order inside each file
  * reproducible, not task-arrival-ordered.
  */
object Export {

  def writeSharded(
      df: DataFrame, dir: String, shards: Int, keyCol: String,
      sortCols: Seq[String] = Nil): Unit = {
    require(shards >= 1, "shards must be >= 1")
    writeShardedBy(df, dir, shards,
      pmod(xxhash64(col(keyCol)), lit(shards.toLong)),
      if (sortCols.isEmpty) Seq(keyCol) else sortCols)
  }

  /** [[writeSharded]] with a caller-computed shard rule (any
    * deterministic pure function of row content — e.g. [[md5Shard]]
    * when the membership must replay outside the JVM). Same layout and
    * reproducibility contract: membership is content-addressed, never a
    * function of partition layout, cluster size, or run order.
    *
    * `mode = "append"` adds the rows as NEW FILES inside the existing
    * `shard=N` directories without touching prior files — the
    * incremental-materialization deployment shape (an increment lands
    * beside the corpus shards; old shards are never rewritten). The
    * shard rule must match the store's or membership splits.
    */
  def writeShardedBy(
      df: DataFrame, dir: String, shards: Int,
      shardCol: org.apache.spark.sql.Column, sortCols: Seq[String],
      mode: String = "overwrite"): Unit = {
    require(shards >= 1, "shards must be >= 1")
    require(!df.columns.contains("shard"), "'shard' column name is reserved")
    require(sortCols.nonEmpty, "sortCols must pin the in-file row order")
    require(mode == "overwrite" || mode == "append",
      "sharded export supports overwrite or append")
    df.withColumn("shard", shardCol)
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard") +: sortCols.map(col): _*)
      .write.mode(mode).partitionBy("shard").parquet(dir)
  }

  /** Content-addressed shard rule that replays OUTSIDE the JVM: the
    * first md5 hex byte of the UTF-8 key modulo `shards`. xxhash64 (the
    * [[writeSharded]] default) has no cross-engine twin, so an export
    * whose shard membership must be independently recomputable (an
    * oracle, a non-JVM loader) keys on md5 — the salted-md5 family the
    * sampling/mixture operators already use for engine-portable
    * determinism. One hex byte = 256 buckets folding onto `shards`.
    */
  def md5Shard(key: org.apache.spark.sql.Column, shards: Int): org.apache.spark.sql.Column = {
    require(shards >= 1 && shards <= 256, "md5Shard folds one hex byte: shards in [1, 256]")
    pmod(conv(substring(md5(encode(key, "UTF-8")), 1, 2), 16, 10).cast("long"),
      lit(shards.toLong))
  }

  /** Local twin of [[md5Shard]] for loaders/tests (no Spark job). */
  def md5ShardOf(key: String, shards: Int): Int = {
    require(shards >= 1 && shards <= 256, "md5Shard folds one hex byte: shards in [1, 256]")
    val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(
      key.getBytes(java.nio.charset.StandardCharsets.UTF_8)).substring(0, 2)
    math.floorMod(Integer.parseInt(hex, 16), shards)
  }

  /** Rendezvous (highest-random-weight) shard rule — the ELASTIC
    * counterpart of [[md5Shard]]: where pmod reshuffles ~all keys when
    * the shard count changes, rendezvous hashing moves ONLY the keys
    * whose per-shard weight argmax lands on a new shard — provably
    * ~1/(n+1) of keys when growing n → n+1, and a moved key can move
    * only TO the new shard (its weights for the old shards are
    * unchanged, so a changed argmax must be the newcomer). That is the
    * property a petabyte shard store needs to grow without a rewrite.
    *
    * Weight(key, s) = the first 15 md5 hex chars of `key#s` as a 60-bit
    * integer — the salted-md5 determinism family, so the rule replays
    * in any engine (the [[md5ShardOf]] portability argument). Built-in
    * expressions only; `shards` is policy-sized, so the per-key
    * argmax is a transform over a small literal array.
    */
  def rendezvousShard(key: org.apache.spark.sql.Column, shards: Int): org.apache.spark.sql.Column = {
    require(shards >= 1 && shards <= 4096, "rendezvousShard: shards in [1, 4096]")
    val weights = sequence(lit(0), lit(shards - 1))
    aggregate(
      transform(weights, s => struct(
        conv(substring(md5(encode(concat(key, lit("#"), s.cast("string")), "UTF-8")),
          1, 15), 16, 10).cast("long").as("w"),
        s.as("shard"))),
      struct(lit(-1L).as("w"), lit(-1).as("shard")),
      (best, cur) => when(cur.getField("w") > best.getField("w"), cur).otherwise(best))
      .getField("shard")
  }

  /** Local twin of [[rendezvousShard]] for loaders/tests (no Spark job). */
  def rendezvousShardOf(key: String, shards: Int): Int = {
    require(shards >= 1 && shards <= 4096, "rendezvousShard: shards in [1, 4096]")
    (0 until shards).maxBy { s =>
      java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(
          s"$key#$s".getBytes(java.nio.charset.StandardCharsets.UTF_8)).substring(0, 15), 16)
    }
  }

  /** The shard a key lands in — for loaders/tests to locate rows.
    * Evaluated LOCALLY (Catalyst literal eval, no Spark job: a loader
    * resolving N keys must not pay N job round-trips) and TYPED: xxhash64
    * hashes a 4-byte int differently from the same value as an 8-byte
    * long, so the overloads pin the JVM type to the exported column type.
    */
  def shardOf(key: Long, shards: Int): Int = shardOfLiteral(Literal(key), shards)
  def shardOf(key: String, shards: Int): Int = shardOfLiteral(Literal(key), shards)

  private def shardOfLiteral(l: Literal, shards: Int): Int =
    // seed 42 == the SQL xxhash64() function's fixed seed
    math.floorMod(
      XxHash64(Seq(l), 42L).eval(null).asInstanceOf[Long], shards.toLong).toInt
}
