package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** COLUMN MAPPING ([[TxTable.renameColumn]]/[[TxTable.dropColumn]]) —
  * the Delta name-mode shape: rename and drop are METADATA-ONLY
  * commits (no file rewritten), reads re-alias through the mapping,
  * writes translate back to the physical names the files store,
  * recorded stats keep pruning across a rename, tombstoned names can
  * never be re-used, and the mapping rides checkpoints and restore.
  */
class TxTableColMapSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("txcolmap").toString

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, i * 10, s"s$i")).toDF("id", "v", "tag")

  private def dataDirCount(dir: String): Int = {
    val p = java.nio.file.Paths.get(dir, "data")
    val st = java.nio.file.Files.list(p)
    try { import scala.jdk.CollectionConverters._; st.iterator().asScala.size }
    finally st.close()
  }

  test("rename is metadata-only: no file rewritten, reads re-alias, writes translate, " +
      "stats keep pruning under the new name") {
    val dir = freshDir()
    (0 until 3).foreach(i =>
      TxTable.append(spark, dir, rows(i * 100, i * 100 + 10), statsCols = Seq("id")))
    val dirsBefore = dataDirCount(dir)
    val liveBefore = TxTable.liveDirs(spark, dir)
    TxTable.renameColumn(spark, dir, "id", "doc_id")
    // METADATA-ONLY: zero new data directories, live set identical
    assert(dataDirCount(dir) == dirsBefore)
    assert(TxTable.liveDirs(spark, dir) == liveBefore)
    // reads surface the new name
    val snap = TxTable.snapshot(spark, dir)
    assert(snap.columns.toSeq == Seq("doc_id", "v", "tag"))
    assert(snap.select("doc_id").collect().map(_.getLong(0)).sorted.length == 30)
    // the OLD name is gone from reads and refused by writes
    intercept[Exception] { snap.select("id").collect() }
    intercept[IllegalArgumentException] {
      TxTable.append(spark, dir, rows(900, 902)) // still carries 'id'
    }
    // writes under the NEW name land (translated back to physical 'id')
    TxTable.append(spark, dir,
      Seq((900L, 9000L, "s900")).toDF("doc_id", "v", "tag"), statsCols = Seq("doc_id"))
    assert(TxTable.snapshot(spark, dir).count() == 31)
    // stats pruning works through the rename: predicate under the new
    // name prunes the disjoint pre-rename directories
    val ranged = TxTable.snapshotRange(spark, dir, "doc_id", 100L, 105L)
    assert(ranged.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      (100L to 105L))
    val kept = ranged.inputFiles.flatMap("data/[^/]+".r.findFirstIn(_)).distinct
    assert(kept.length == 1, s"rename must not break pruning: ${kept.toSeq}")
    // liveDirStats reports the logical name
    assert(TxTable.liveDirStats(spark, dir).values.forall(_.contains("doc_id")))
    // time travel to a pre-rename version still reads (projection is
    // per-state: the OLD state had no mapping, so the old name shows)
    assert(TxTable.snapshot(spark, dir, Some(1L)).columns.toSeq == Seq("id", "v", "tag"))
  }

  test("drop is metadata-only: column vanishes from reads, writes stop carrying it, " +
      "the tombstoned name is never re-usable") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 5))
    val dirsBefore = dataDirCount(dir)
    TxTable.dropColumn(spark, dir, "tag")
    assert(dataDirCount(dir) == dirsBefore, "drop must rewrite nothing")
    assert(TxTable.snapshot(spark, dir).columns.toSeq == Seq("id", "v"))
    // new writes need not (and must not) carry the dropped column
    TxTable.append(spark, dir, Seq((10L, 100L)).toDF("id", "v"))
    assert(TxTable.snapshot(spark, dir, mergeSchema = true).count() == 6)
    // re-using the tombstoned name is rejected — old files still hold
    // its bytes, and re-adding would resurrect them under mergeSchema
    val e = intercept[IllegalArgumentException] {
      TxTable.append(spark, dir,
        Seq((11L, 110L, "boo")).toDF("id", "v", "tag"), allowAdditive = true)
    }
    assert(e.getMessage.contains("DROPPED"))
    // delete/merge keep working over the mapped table
    TxTable.delete(spark, dir, col("id") === 0L)
    assert(TxTable.snapshot(spark, dir, mergeSchema = true).count() == 5)
    TxTable.merge(spark, dir,
      Seq((1L, -1L, "U", 1L)).toDF("id", "v", "op", "ts"), Seq("id"), Seq("ts"))
    val got = TxTable.snapshot(spark, dir, mergeSchema = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == -1L && !got.contains(0L))
    assert(!TxTable.snapshot(spark, dir).columns.contains("tag"))
  }

  test("chained renames, rename-back, and DDL guards") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 3))
    TxTable.renameColumn(spark, dir, "v", "value")
    TxTable.renameColumn(spark, dir, "value", "amount")
    assert(TxTable.snapshot(spark, dir).columns.toSeq == Seq("id", "amount", "tag"))
    // renaming back to the physical name drops the indirection
    TxTable.renameColumn(spark, dir, "amount", "v")
    assert(TxTable.columnMapping(spark, dir).isIdentity)
    // guards: unknown source, colliding target, last-column drop
    intercept[IllegalArgumentException] { TxTable.renameColumn(spark, dir, "nope", "x") }
    intercept[IllegalArgumentException] { TxTable.renameColumn(spark, dir, "v", "id") }
    TxTable.dropColumn(spark, dir, "tag")
    TxTable.dropColumn(spark, dir, "v")
    intercept[IllegalArgumentException] { TxTable.dropColumn(spark, dir, "id") }
    // a constraint referencing a column blocks its rename/drop
    TxTable.addConstraint(spark, dir, "id_nonneg", "id >= 0")
    val g = intercept[IllegalArgumentException] {
      TxTable.renameColumn(spark, dir, "id", "key")
    }
    assert(g.getMessage.contains("id_nonneg"))
  }

  test("the mapping rides checkpoints, CDF, restore, and the follow stream; " +
      "overwrite resets it") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 4))                      // v1
    TxTable.renameColumn(spark, dir, "v", "amount")             // v2
    TxTable.delete(spark, dir, col("amount") === 0L)            // v3 (logical predicate)
    assert(TxTable.snapshot(spark, dir).select("amount")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(10L, 20L, 30L))
    // CDF reports under the CURRENT names on both sides of the window
    val feed = TxTable.tableChanges(spark, dir, 1L, 3L)
    assert(feed.columns.contains("amount") && !feed.columns.contains("v"))
    assert(feed.collect().map(r =>
      (r.getLong(0), r.getString(r.fieldIndex("_change_type")))).toSeq ==
      Seq((0L, "delete")))
    // past a checkpoint (9+ commits) the mapping still applies
    (0 until 7).foreach(i =>
      TxTable.append(spark, dir, (100L + i, 1L, "x") :: Nil toDF("id", "amount", "tag")))
    assert(TxTable.replayBase(spark, dir) >= 8L)
    assert(TxTable.snapshot(spark, dir).columns.contains("amount"))
    // restore to a PRE-rename version re-records the empty mapping
    TxTable.restore(spark, dir, 1L)
    assert(TxTable.snapshot(spark, dir).columns.toSeq == Seq("id", "v", "tag"))
    assert(TxTable.columnMapping(spark, dir).isIdentity)
    // re-apply a mapping, then overwrite: wholesale replace resets it
    TxTable.renameColumn(spark, dir, "v", "amount")
    TxTable.overwrite(spark, dir, Seq((1L, "fresh")).toDF("k", "s"))
    assert(TxTable.columnMapping(spark, dir).isIdentity)
    assert(TxTable.snapshot(spark, dir).columns.toSeq == Seq("k", "s"))
  }
}
