package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-files compaction for parquet directories — streaming sinks and
  * incremental ingests accrete files far below the scan-efficient size,
  * and at scale the file COUNT (listing, footer reads, task scheduling)
  * becomes the bottleneck before the byte count does.
  *
  * Rewrites a directory into ⌈total bytes / targetBytes⌉ files: plain
  * round-robin when no clustering is requested (balanced file sizes), or
  * `repartitionByRange(clusterBy)` to keep/establish value clustering so
  * min/max row-group pruning keeps working after the rewrite. The
  * rewrite lands in a sibling temp directory, the live directory is
  * renamed aside, the rewrite renamed in, and only then is the old copy
  * deleted — a full copy of the data exists on disk at every step, so a
  * crash at any point is recoverable (readers can race the two renames;
  * each rename is atomic on a local/HDFS filesystem, NOT on object
  * stores — at real scale run compaction under a table format's
  * transaction: the operator is the data motion, the format is the
  * commit protocol).
  */
object Compact {

  /** @return the number of files written */
  def rewriteParquet(
      spark: SparkSession, dir: String, targetBytes: Long,
      clusterBy: Seq[String] = Nil): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    // A flat listing under a Hive-partitioned layout would sum 0 bytes
    // (all data sits in subdirectories) and silently rewrite the whole
    // dataset into ONE file with the partition columns flattened into
    // data columns. Partition-preserving compaction needs a per-partition
    // rewrite under a table format's commit protocol — refuse, don't guess.
    val entries = fs.listStatus(path)
    val dataDirs = entries.filter(e =>
      e.isDirectory && !e.getPath.getName.startsWith("_") && !e.getPath.getName.startsWith("."))
    require(dataDirs.isEmpty,
      s"$dir contains subdirectories (${dataDirs.take(3).map(_.getPath.getName).mkString(", ")}…): " +
        "partitioned layouts need per-partition compaction, not a flat rewrite")
    val totalBytes = entries
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(dir)
    val laid =
      if (clusterBy.isEmpty) df.repartition(n)
      else df.repartitionByRange(n, clusterBy.map(col): _*)
    // DOT-prefixed sibling scratch names: Hive partition discovery (and
    // this file's own leaf walks) skip dot/underscore entries, so when the
    // rewritten directory is a partition leaf, an in-flight or crashed
    // swap never surfaces as a phantom partition to concurrent readers
    val tmp = new Path(path.getParent, s".${path.getName}__compacting")
    val old = new Path(path.getParent, s".${path.getName}__precompact")
    laid.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(old, true) // stale leftover from a previous crashed run
    if (!fs.rename(path, old))
      throw new java.io.IOException(s"compaction swap failed: $path -> $old")
    if (!fs.rename(tmp, path)) {
      fs.rename(old, path) // restore the original before giving up
      throw new java.io.IOException(s"compaction swap failed: $tmp -> $path")
    }
    fs.delete(old, true)
    n
  }

  /** Compaction for HIVE-PARTITIONED layouts: every LEAF partition
    * directory is rewritten independently with [[rewriteParquet]]'s
    * temp-and-swap protocol, so partition columns stay directory-encoded
    * and partition pruning keeps working. Returns (partition path →
    * files written). Each leaf rewrite is its own distributed job —
    * driver-side iteration is over the PARTITION LIST, which is exactly
    * the thing a metastore keeps driver-sized; at very high partition
    * counts run the leaves in batches (or under a table format's OPTIMIZE,
    * which is this loop plus a transaction log).
    */
  def rewritePartitionedParquet(
      spark: SparkSession, dir: String, targetBytes: Long,
      clusterBy: Seq[String] = Nil): Map[String, Int] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def leaves(p: Path): Seq[Path] = {
      val entries = fs.listStatus(p)
      val subdirs = entries.filter(e =>
        e.isDirectory && !e.getPath.getName.startsWith("_") && !e.getPath.getName.startsWith("."))
      if (subdirs.isEmpty) Seq(p) else subdirs.toSeq.flatMap(d => leaves(d.getPath))
    }
    require(fs.getFileStatus(root).isDirectory, s"$dir is not a directory")
    val leafDirs = leaves(root).filter(p => p != root)
    // a flat layout belongs to rewriteParquet — refuse loudly, don't
    // return an empty map that reads as "compacted, nothing to do"
    require(leafDirs.nonEmpty,
      s"$dir has no partition subdirectories: use rewriteParquet for flat layouts")
    leafDirs
      .filter(p => fs.listStatus(p).exists(f =>
        f.isFile && f.getPath.getName.endsWith(".parquet"))) // skip empty leaves
      .map(p => p.toString ->
        rewriteParquet(spark, p.toString, targetBytes, clusterBy))
      .toMap
  }
}
