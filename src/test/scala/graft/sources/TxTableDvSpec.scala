package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** DELETION VECTORS ([[TxTable.deleteRows]]) — merge-on-read row-level
  * deletes: a delete records (file, row-position) pairs in a parquet
  * sidecar and rewrites NOTHING; reads anti-join the pairs away, every
  * rewrite folds them, the CDF reports them as delete rows, time travel
  * sees the per-version DV set, restore rolls it back, and
  * [[TxTable.compactDvs]] + [[TxTable.vacuum]] are the hygiene pair.
  */
class TxTableDvSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("txdv").toString

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, i * 10)).toDF("id", "v")

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).sorted.toSeq

  private def dataDirs(dir: String): Set[String] = {
    val p = java.nio.file.Paths.get(dir, "data")
    val st = java.nio.file.Files.list(p)
    try { import scala.jdk.CollectionConverters._
      st.iterator().asScala.map(_.getFileName.toString).toSet }
    finally st.close()
  }

  test("deleteRows rewrites NOTHING: data directories byte-identical, snapshot " +
      "excludes the rows, history intact, deletes accumulate") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 10))
    TxTable.append(spark, dir, rows(10, 20))
    val before = dataDirs(dir)
    assert(TxTable.deleteRows(spark, dir, col("id") % 5 === 0) == 3L)
    assert(dataDirs(dir) == before, "a DV delete must not touch any data directory")
    assert(TxTable.deletionVectors(spark, dir).size == 1)
    assert(ids(TxTable.snapshot(spark, dir)) == (0L until 20L).filter(_ % 5 != 0))
    // time travel: pre-delete versions still read everything
    assert(ids(TxTable.snapshot(spark, dir, Some(2L))) == (0L until 20L))
    // a second DV delete accumulates
    TxTable.deleteRows(spark, dir, col("id") === 7L)
    assert(ids(TxTable.snapshot(spark, dir)) ==
      (0L until 20L).filter(i => i % 5 != 0 && i != 7))
    assert(dataDirs(dir) == before)
    // already-DV-deleted rows are not re-recorded and a no-match
    // delete is harmless
    TxTable.deleteRows(spark, dir, col("id") === 7L)
    assert(ids(TxTable.snapshot(spark, dir)) ==
      (0L until 20L).filter(i => i % 5 != 0 && i != 7))
  }

  test("reads compose with DVs: stats-pruned scans, appends after deletes, " +
      "aggregates over the net content") {
    val dir = freshDir()
    (0 until 3).foreach(i =>
      TxTable.append(spark, dir, rows(i * 100, i * 100 + 10), statsCols = Seq("id")))
    TxTable.deleteRows(spark, dir, col("id") === 105L,
      pruneHint = Seq(TxTable.LongRange("id", 105L, 105L)))
    // pruned read through the DV: the surviving directory's scan drops
    // the deleted row; disjoint directories still prune
    val got = TxTable.snapshotRange(spark, dir, "id", 100L, 109L)
    assert(ids(got) == (100L until 110L).filterNot(_ == 105L))
    // appends keep working; the DV applies only to its recorded files
    TxTable.append(spark, dir, rows(105, 106), statsCols = Seq("id"))
    assert(ids(TxTable.snapshotRange(spark, dir, "id", 100L, 109L)) ==
      (100L until 110L))
    assert(TxTable.snapshot(spark, dir).count() == 30L)
  }

  test("rewrites FOLD deletion vectors: compact applies them and the sidecars " +
      "become inert; compactDvs folds sidecars; vacuum reclaims retired ones") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 10))
    TxTable.append(spark, dir, rows(10, 20))
    TxTable.deleteRows(spark, dir, col("id") < 3L)
    TxTable.deleteRows(spark, dir, col("id") === 15L)
    assert(TxTable.deletionVectors(spark, dir).size == 2)
    // compact reads through the DVs: the folded directory holds only
    // surviving rows, and the old sidecars no longer reference any
    // live file
    TxTable.compact(spark, dir)
    assert(ids(TxTable.snapshot(spark, dir)) ==
      (3L until 20L).filterNot(_ == 15L))
    // compactDvs drops pairs whose directories are gone — everything,
    // here — leaving zero outstanding sidecars
    assert(TxTable.compactDvs(spark, dir).isDefined)
    assert(TxTable.deletionVectors(spark, dir).isEmpty)
    assert(ids(TxTable.snapshot(spark, dir)) ==
      (3L until 20L).filterNot(_ == 15L))
    // retired sidecars reclaim past the horizon
    Thread.sleep(15)
    val reclaimed = TxTable.vacuum(spark, dir, horizonMs = 0L)
    assert(reclaimed.count(_.startsWith("dv/")) == 2, s"got $reclaimed")
  }

  test("CDF sees DV deletes: per-version slices report the deleted rows; " +
      "restore rolls the vector set back (resurrection as inserts)") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 10))      // v1
    TxTable.deleteRows(spark, dir, col("id") >= 8L) // v2
    val slice = TxTable.tableChangesByVersion(spark, dir, 1L, 2L)
      .collect().map(r => (r.getLong(0), r.getString(r.fieldIndex("_change_type"))))
      .sortBy(identity).toSeq
    assert(slice == Seq((8L, "delete"), (9L, "delete")), s"got $slice")
    // net feed across append + DV delete
    val net = TxTable.tableChanges(spark, dir, 0L, 2L)
      .collect().map(r => (r.getLong(0), r.getString(r.fieldIndex("_change_type"))))
      .sortBy(identity).toSeq
    assert(net == (0L until 8L).map(i => (i, "insert")))
    // restore to v1: the DV retires, the rows resurface — and the CDF
    // reports the resurrection as inserts
    TxTable.restore(spark, dir, 1L)              // v3
    assert(ids(TxTable.snapshot(spark, dir)) == (0L until 10L))
    assert(TxTable.deletionVectors(spark, dir).isEmpty)
    val res = TxTable.tableChanges(spark, dir, 2L, 3L)
      .collect().map(r => (r.getLong(0), r.getString(r.fieldIndex("_change_type"))))
      .sortBy(identity).toSeq
    assert(res == Seq((8L, "insert"), (9L, "insert")), s"got $res")
  }

  test("DVs ride checkpoints and compose with column mapping and merge") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 10))
    TxTable.renameColumn(spark, dir, "v", "amount")
    // the predicate is LOGICAL; the DV pairs are physical positions
    TxTable.deleteRows(spark, dir, col("amount") === 30L)
    assert(TxTable.snapshot(spark, dir).select("amount")
      .collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 10L).map(_ * 10).filterNot(_ == 30L))
    // across a checkpoint boundary (9+ commits) the DV set survives
    (0 until 7).foreach(i =>
      TxTable.append(spark, dir, Seq((100L + i, 1L)).toDF("id", "amount")))
    assert(TxTable.replayBase(spark, dir) >= 8L)
    assert(!ids(TxTable.snapshot(spark, dir)).isEmpty)
    assert(TxTable.snapshot(spark, dir).filter(col("amount") === 30L).count() == 0L)
    // a merge's survivor rewrite folds the DV for the touched directory
    TxTable.merge(spark, dir,
      Seq((0L, -1L, "U", 1L)).toDF("id", "amount", "op", "ts"), Seq("id"), Seq("ts"))
    val got = TxTable.snapshot(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == -1L && !got.values.toSeq.contains(30L))
  }

  test("compactDvs RE-TIGHTENS stats that boundary-row deletes left " +
      "conservative (r16 verdict #6)") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 100).coalesce(1), statsCols = Seq("id"))
    // two merge-on-read deletes carve off BOTH boundaries; recorded
    // stats stay the conservative pre-delete range (documented)
    TxTable.deleteRows(spark, dir, col("id") >= 90L)
    TxTable.deleteRows(spark, dir, col("id") < 10L)
    val loose = TxTable.liveDirStats(spark, dir).values.head("id")
    assert(loose == (0L, 99L), s"pre-fold stats stay conservative: $loose")
    // the fold recomputes over the DV-applied scan and narrows
    assert(TxTable.compactDvs(spark, dir).isDefined)
    val tight = TxTable.liveDirStats(spark, dir).values.head("id")
    assert(tight == (10L, 89L), s"folded stats must re-tighten: $tight")
    assert(ids(TxTable.snapshot(spark, dir)) == (10L until 90L),
      "re-tightening must be answer-invisible")
    // the sharpened range now PRUNES a read the loose one kept: the
    // indexed scan drops the only file for an out-of-range point
    val (df, idx) = TxFileIndex.relationWithIndex(spark, dir)
    assert(df.filter(col("id") === 95L).count() == 0L)
    assert(idx.lastKeptFiles == 0,
      s"the tightened per-file stats must prune, kept ${idx.lastKeptFiles}")
    // and snapshotRange's directory pruning sharpened the same way
    assert(TxTable.snapshotRange(spark, dir, "id", 95L, 99L).inputFiles.isEmpty)
  }
}
