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
    require(!df.columns.contains("shard"), "'shard' column name is reserved")
    val order = if (sortCols.isEmpty) Seq(keyCol) else sortCols
    df.withColumn("shard", pmod(xxhash64(col(keyCol)), lit(shards.toLong)))
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard") +: order.map(col): _*)
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
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
