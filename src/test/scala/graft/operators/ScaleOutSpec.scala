package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.SparkTestBase

class ScaleOutSpec extends SparkTestBase {
  import spark.implicits._

  private val target = spark.sparkContext.defaultParallelism

  test("a 1-partition LogicalRDD leaf is widened despite its default-huge stats") {
    // RDD leaves report a default (huge) sizeInBytes — the byte-math path
    // would conclude "plenty of splits" and skip the widen for a frame
    // that is genuinely 1 partition
    val rdd = spark.sparkContext.parallelize((0L until 64L).map(Row(_)), 1)
    val df = spark.createDataFrame(rdd, StructType(Seq(StructField("v", LongType))))
    assert(df.rdd.getNumPartitions == 1)
    assert(ScaleOut(df).rdd.getNumPartitions == target)
  }

  test("an upstream coalesce(1) over a file scan is widened (invisible to leaf stats)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scaleout").resolve("t").toString
    (0L until 100000L).toDF("v").repartition(8).write.parquet(dir)
    val df = spark.read.parquet(dir).coalesce(1)
    assert(df.rdd.getNumPartitions == 1)
    assert(ScaleOut(df).rdd.getNumPartitions == target)
  }

  test("an already-wide file scan is left untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scaleout").resolve("w").toString
    (0L until 1000L).toDF("v").write.parquet(dir)
    val df = spark.read.parquet(dir)
    // tiny single-file scan: byte math says ~1 split -> widen
    assert(ScaleOut(df).rdd.getNumPartitions == target)
    // explicit wide layout: fallback path sees enough partitions -> no-op
    val wide = df.repartition(target)
    assert(ScaleOut(wide) eq wide)
  }
}
