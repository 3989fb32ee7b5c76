package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Repartition, RepartitionByExpression}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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
    // … but the byte math only describes FILE-SOURCE leaves. A LogicalRDD
    // or JDBC leaf reports a default-huge sizeInBytes (skipping the widen
    // for a frame that may genuinely be 1 partition), and an upstream
    // coalesce/repartition(1) is invisible to leaf stats entirely. In
    // either regime fall back to the physical partition count — the
    // plan-build cost the stats path avoids is worth paying when the
    // estimate cannot be trusted.
    val conf = spark.sessionState.conf
    val plan = df.queryExecution.optimizedPlan
    val leaves = plan.collectLeaves()
    val allFileLeaves = leaves.nonEmpty && leaves.forall {
      case l: LogicalRelation => l.relation.isInstanceOf[HadoopFsRelation]
      case _ => false
    }
    val explicitLayout = plan.exists {
      case _: Repartition | _: RepartitionByExpression => true
      case _ => false
    }
    if (!allFileLeaves || explicitLayout) {
      if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
    } else {
      val bytes = leaves.map(_.stats.sizeInBytes).sum
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
}
