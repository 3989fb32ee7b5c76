package graft.sources

import java.io.File

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ExportSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val data = (0 until 10000).map(i => (i.toLong, s"doc$i")).toDF("id", "text")

  test("sharded export: one directory per shard, every row exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_export").resolve("t").toString
    Export.writeSharded(data, dir, shards = 8, keyCol = "id")
    val shardDirs = new File(dir).listFiles().filter(_.getName.startsWith("shard=")).toSeq
    assert(shardDirs.map(_.getName).sorted == (0 until 8).map(i => s"shard=$i"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 10000L)
    assert(back.select("id").distinct().count() == 10000L)
  }

  test("shard membership is content-addressed and reproducible across exports") {
    val d1 = java.nio.file.Files.createTempDirectory("graft_export").resolve("a").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft_export").resolve("b").toString
    Export.writeSharded(data, d1, shards = 8, keyCol = "id")
    // different input layout, same content -> identical shard assignment
    Export.writeSharded(data.repartition(13), d2, shards = 8, keyCol = "id")
    def membership(dir: String) = spark.read.parquet(dir)
      .select(col("id"), col("shard")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val m1 = membership(d1)
    assert(m1 == membership(d2))
    // and matches the published (locally-evaluated, Long-typed) shard function
    val probe = Seq(0L, 42L, 9999L)
    probe.foreach { id =>
      assert(m1(id) == Export.shardOf(id, 8), s"id $id")
    }
  }

  test("md5 shard rule: layout-invariant membership, local twin agrees") {
    // the engine-portable shard rule the q131 materialization exports
    // under: membership must be a pure function of the key — identical
    // across input layouts — and the local (no-job) twin must agree
    // with the column form
    val keyed = data.withColumn("k", concat(col("id").cast("string"), lit(":x")))
    val d1 = java.nio.file.Files.createTempDirectory("graft_export").resolve("a").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft_export").resolve("b").toString
    Export.writeShardedBy(keyed, d1, 8, Export.md5Shard(col("k"), 8), Seq("id"))
    Export.writeShardedBy(keyed.repartition(13), d2, 8, Export.md5Shard(col("k"), 8), Seq("id"))
    def membership(dir: String) = spark.read.parquet(dir)
      .select(col("k"), col("shard")).collect()
      .map(r => (r.getString(0), r.getInt(1))).toMap
    val m1 = membership(d1)
    assert(m1 == membership(d2))
    Seq("0:x", "42:x", "9999:x").foreach { k =>
      assert(m1(k) == Export.md5ShardOf(k, 8), s"key $k")
    }
  }

  test("rows inside each file are sort-ordered, not arrival-ordered") {
    val dir = java.nio.file.Files.createTempDirectory("graft_export").resolve("t").toString
    Export.writeSharded(data.repartition(17), dir, shards = 4, keyCol = "id")
    val shard0 = spark.read.parquet(s"$dir/shard=0").select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(shard0 == shard0.sorted, "rows not sorted within the shard file")
  }

  test("rendezvous resharding: column == local twin; n->n+1 moves only TO the new shard") {
    val keys = (0 until 400).map(i => s"key:$i")
    val df = keys.toDF("k")
      .select(col("k"),
        Export.rendezvousShard(col("k"), 8).as("s8"),
        Export.rendezvousShard(col("k"), 9).as("s9"))
    val got = df.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    got.foreach { case (k, s8, s9) =>
      assert(s8 == Export.rendezvousShardOf(k, 8), s"column/twin mismatch at $k (n=8)")
      assert(s9 == Export.rendezvousShardOf(k, 9), s"column/twin mismatch at $k (n=9)")
      // the HRW minimal-movement law: a changed assignment must be the newcomer
      if (s8 != s9) assert(s9 == 8, s"$k moved to $s9, not the new shard")
    }
    val moved = got.count { case (_, s8, s9) => s8 != s9 }
    // E[moved] = 400/9 ≈ 44; a generous band still catches a broken rule
    assert(moved > 15 && moved < 100, s"implausible movement count $moved")
    // balance: every shard of the 9-way split is populated
    assert(got.map(_._3).distinct.sorted.toSeq == (0 until 9).toSeq)
  }
}
