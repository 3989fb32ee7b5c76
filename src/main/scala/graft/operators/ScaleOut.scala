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
  */
object ScaleOut {
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else {
      // RDD boundary, not Dataset.repartition: the ExistingRDD leaf is
      // opaque to Catalyst, so downstream inferred predicates (join-key
      // isnotnull constraints, generator guards) cannot alias-substitute
      // expensive expressions below the exchange and sink them into the
      // narrow scan stage. The row-conversion cost is bounded by the
      // (small, by the branch condition) input size.
      spark.createDataFrame(df.rdd.repartition(target), df.schema)
    }
  }
}
