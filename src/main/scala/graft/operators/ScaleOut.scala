package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism guard for CPU-bound kernels (shingling, minhash/simhash
  * signatures, hyperplane projections, per-pair verification).
  *
  * File sources split by BYTES (`spark.sql.files.maxPartitionBytes`), so a
  * small-but-expensive input — 5,000 documents in one 2 MB parquet file —
  * arrives as ONE partition and serializes the whole kernel on one core.
  * At 100 TB the same tables arrive as thousands of splits and this guard
  * is a no-op; it only widens inputs that are narrower than the cluster's
  * core count, which is exactly the regime where the one-off round-robin
  * shuffle (bounded by the small input's size) is trivially cheap.
  *
  * Plain `repartition`, NOT an RDD round-trip: a `LogicalRDD` leaf has no
  * stats (`sizeInBytes` defaults to huge), which silently disables
  * broadcast planning for every join above it — the exact-cosine self-join
  * degenerated to a CartesianProduct over 32x32 partition pairs because of
  * it. `Repartition` keeps the scan's stats AND is an optimizer barrier
  * for expression pushdown, and the one rule that would still sink the
  * expensive kernel below it (`InferFiltersFromGenerate`) is excluded
  * session-wide in [[graft.SessionDefaults]].
  */
object ScaleOut {
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // Estimate the scan's split count from the LEAF relations' byte
    // sizes — the same byte math FilePartition planning uses — instead of
    // `df.rdd.getNumPartitions`, which built the full physical plan and an
    // RDD lineage on every operator call just to read a partition count
    // (and read it off the pre-AQE plan at that). Leaf stats, not the
    // frame's own: a Project's stats are scaled down by column pruning,
    // which would under-estimate the split count of a wide table behind a
    // narrow projection; the scheduler splits on FILE bytes, and for a
    // file relation the leaf's sizeInBytes is exactly that sum. So:
    // splits ≈ bytes / min(maxPartitionBytes, max(openCost, bytes/parallelism)).
    val conf = spark.sessionState.conf
    val bytes = df.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes).sum
    val maxSplit = conf.filesMaxPartitionBytes
    if (bytes >= BigInt(maxSplit) * target) df // >= target splits even at the coarsest split size
    else {
      val perSplit = math.min(maxSplit,
        math.max(conf.filesOpenCostInBytes, math.max(bytes.toLong / target, 1L)))
      val splits = (bytes.toLong + perSplit - 1) / perSplit
      if (splits >= target) df else df.repartition(target)
    }
  }
}
