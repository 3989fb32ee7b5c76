package graft.sources

import java.io.File

import graft.SparkTestBase

class CompactSpec extends SparkTestBase {
  import spark.implicits._

  private def parquetFiles(dir: String): Seq[File] =
    new File(dir).listFiles().toSeq.filter(_.getName.endsWith(".parquet"))

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_compact").resolve("t").toString

  test("compaction collapses a fragmented directory, preserving every row") {
    val dir = freshDir()
    val data = (0 until 20000).map(i => (i.toLong, s"v$i"))
    data.toDF("id", "v").repartition(64).write.parquet(dir)
    assert(parquetFiles(dir).size == 64)
    val n = Compact.rewriteParquet(spark, dir, targetBytes = 512L * 1024 * 1024)
    assert(n == 1)
    assert(parquetFiles(dir).size == 1)
    // the swap cleans up both scratch directories
    val parent = new File(dir).getParentFile
    assert(!parent.listFiles().exists(_.getName.contains("__compact")),
      s"scratch dirs left behind: ${parent.listFiles().map(_.getName).toSeq}")
    assert(!parent.listFiles().exists(_.getName.contains("__precompact")))
    val back = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(back == data.sorted)
  }

  test("refuses a Hive-partitioned layout instead of silently flattening it") {
    val dir = freshDir()
    (0 until 100).map(i => (i.toLong, i % 3)).toDF("id", "p")
      .write.partitionBy("p").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      Compact.rewriteParquet(spark, dir, targetBytes = 1024L * 1024)
    }
    assert(e.getMessage.contains("partitioned"), e.getMessage)
    // untouched: still readable with the partition column intact
    assert(spark.read.parquet(dir).select("id", "p").count() == 100L)
  }

  test("partitioned compaction collapses each leaf, preserving the partition layout") {
    val dir = freshDir()
    (0 until 9000).map(i => (i.toLong, i % 3)).toDF("id", "p")
      .repartition(24).write.partitionBy("p").parquet(dir)
    val before = spark.read.parquet(dir)
      .select("id", "p").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
    val written = Compact.rewritePartitionedParquet(spark, dir, targetBytes = 512L * 1024 * 1024)
    assert(written.size == 3 && written.values.forall(_ == 1), s"got $written")
    // each partition dir now holds exactly one parquet file
    for (p <- 0 until 3)
      assert(parquetFiles(s"$dir/p=$p").size == 1, s"p=$p not compacted")
    // partition column still directory-encoded and every row intact
    val after = spark.read.parquet(dir)
      .select("id", "p").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
    assert(after == before)
  }

  test("clusterBy compaction keeps range clustering for min/max pruning") {
    val dir = freshDir()
    (0 until 20000).map(i => (i.toLong, i % 7)).toDF("id", "x")
      .repartition(32).write.parquet(dir)
    // force a few output files, range-clustered by id
    val small = parquetFiles(dir).map(_.length()).sum / 3
    val n = Compact.rewriteParquet(spark, dir, targetBytes = small, clusterBy = Seq("id"))
    assert(n >= 2 && parquetFiles(dir).size == n)
    // ranges must not overlap across files: per-file (min, max) intervals
    // are disjoint when sorted
    val ranges = parquetFiles(dir).map { f =>
      val d = spark.read.parquet(f.getPath)
      val r = d.agg(org.apache.spark.sql.functions.min("id"),
        org.apache.spark.sql.functions.max("id")).head()
      (r.getLong(0), r.getLong(1))
    }.sorted
    ranges.sliding(2).foreach {
      case Seq((_, e1), (s2, _)) => assert(e1 <= s2, s"overlapping ranges: $ranges")
      case _ =>
    }
    assert(spark.read.parquet(dir).count() == 20000L)
  }
}
