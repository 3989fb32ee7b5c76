package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[TxTable]] — the Delta-style commit log: snapshot isolation, time
  * travel, optimistic concurrency (append retries, read-dependent
  * commits abort), crash invisibility, compaction neutrality, and the
  * vacuum retention window.
  */
class TxTableSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("txtable").toString

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, i * 10)).toDF("id", "v")

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("appends accumulate; snapshot reads the tip; versions are ordered") {
    val dir = freshDir()
    assert(TxTable.append(spark, dir, rows(0, 3)) == 1L)
    assert(TxTable.append(spark, dir, rows(3, 5)) == 2L)
    assert(TxTable.versions(spark, dir) == Seq(1L, 2L))
    assert(ids(TxTable.snapshot(spark, dir)) == (0L until 5L))
  }

  test("time travel: every version stays readable until vacuumed") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 3))
    TxTable.append(spark, dir, rows(3, 5))
    TxTable.overwrite(spark, dir, rows(100, 102))
    assert(ids(TxTable.snapshot(spark, dir, Some(1L))) == (0L until 3L))
    assert(ids(TxTable.snapshot(spark, dir, Some(2L))) == (0L until 5L))
    assert(ids(TxTable.snapshot(spark, dir, Some(3L))) == Seq(100L, 101L))
  }

  test("delete is copy-on-write: survivors at the tip, history intact") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 10))
    TxTable.delete(spark, dir, col("id") % 3 === 0)
    assert(ids(TxTable.snapshot(spark, dir)) == (0L until 10L).filter(_ % 3 != 0))
    assert(ids(TxTable.snapshot(spark, dir, Some(1L))) == (0L until 10L))
  }

  test("compaction is snapshot-neutral and collapses the live set to one dir") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 3))
    TxTable.append(spark, dir, rows(3, 6))
    TxTable.append(spark, dir, rows(6, 9))
    val before = ids(TxTable.snapshot(spark, dir))
    assert(TxTable.compact(spark, dir).contains(4L))
    assert(ids(TxTable.snapshot(spark, dir)) == before)
    assert(TxTable.liveDirs(spark, dir).size == 1)
    // a second compact with one live dir is a no-op
    assert(TxTable.compact(spark, dir).isEmpty)
    // pre-compaction versions still read (their dirs not yet vacuumed)
    assert(ids(TxTable.snapshot(spark, dir, Some(2L))) == (0L until 6L))
  }

  test("optimistic concurrency: an append loses the rename race and retries onto the next version") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 2))
    // another writer claims version 2 out from under this one
    val log = java.nio.file.Paths.get(dir, "_log")
    java.nio.file.Files.write(log.resolve("0" * 19 + "2"),
      "op:append\n".getBytes("UTF-8"))
    val v = TxTable.append(spark, dir, rows(2, 4))
    assert(v == 3L, "the loser must land on the NEXT version, not fail")
    assert(ids(TxTable.snapshot(spark, dir)) == (0L until 4L))
  }

  test("read-dependent commits abort on conflict instead of retrying blindly") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 6))
    // a read-dependent writer derived its rewrite from tip = 1; a
    // concurrent append claims version 2 BETWEEN its read and its
    // publish — landing at 3 instead would be write skew (the rewrite
    // does not cover the newcomer's rows), so publishAt(2) must abort
    val log = java.nio.file.Paths.get(dir, "_log")
    java.nio.file.Files.write(log.resolve("0" * 19 + "2"),
      "op:append\n".getBytes("UTF-8"))
    intercept[TxTable.CommitConflict] {
      TxTable.publishAt(spark, dir, 2L, Seq("op:delete", "add:data/stale"))
    }
    // and the commit protocol pins delete/overwrite/compact to exactly
    // read + 1: a delete issued AFTER the claim reads the new tip and
    // lands at 3 with the claim's (empty) adds still live
    assert(TxTable.delete(spark, dir, col("id") === 0) == 3L)
    assert(ids(TxTable.snapshot(spark, dir)) == (1L until 6L))
  }

  test("crash debris is invisible: a data dir without a log entry changes no snapshot") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 3))
    rows(900, 999).write.parquet(s"$dir/data/orphan-crash")
    assert(ids(TxTable.snapshot(spark, dir)) == (0L until 3L))
    // vacuum keeps it inside the horizon (in-flight writer protection) …
    assert(TxTable.vacuum(spark, dir).isEmpty)
    // … and reclaims it past the horizon
    assert(TxTable.vacuum(spark, dir, horizonMs = -1L) == Seq("data/orphan-crash"))
  }

  test("concurrent-writer hammer: racing appends all land, versions stay contiguous") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 1))
    // 8 threads race 3 appends each through the rename-claim protocol;
    // every loser must retry onto the next number, so afterwards the
    // log is a contiguous 1..25 with all 25 payloads exactly once
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    try {
      val tasks = (0 until 8).map { t =>
        pool.submit(new Runnable {
          def run(): Unit =
            try (0 until 3).foreach { i =>
              val base = 100L * (t * 3 + i + 1)
              TxTable.append(spark, dir, rows(base, base + 2))
            } catch { case e: Throwable => failures.add(e) }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    assert(failures.isEmpty, s"append must never fail under racing: ${failures.peek()}")
    assert(TxTable.versions(spark, dir) == (1L to 25L))
    val got = ids(TxTable.snapshot(spark, dir))
    val want = (0L until 1L) ++
      (1 to 24).flatMap(j => Seq(100L * j, 100L * j + 1))
    assert(got == want.sorted, s"expected all 25 payloads exactly once")
  }

  test("additive schema evolution: a widened append reads back with nulls under mergeSchema") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 2))
    // the schema gate refuses the widened frame unless additive
    // evolution is explicitly opted into
    intercept[IllegalArgumentException] {
      TxTable.append(spark, dir, Seq((2L, 20L, "x")).toDF("id", "v", "tag"))
    }
    TxTable.append(spark, dir, Seq((2L, 20L, "x")).toDF("id", "v", "tag"),
      allowAdditive = true)
    // the DEFAULT read is typed by the tracked schema action (the Delta
    // rule: the log's metadata, not a sampled footer, types a read) —
    // post-evolution reads deterministically surface the widened schema,
    // old rows reading the new column as null (r16 advice)
    val tracked = TxTable.snapshot(spark, dir).orderBy("id").collect()
    assert(TxTable.snapshot(spark, dir).columns.toSeq == Seq("id", "v", "tag"),
      "the tracked schema must type the default read deterministically")
    assert(tracked.take(2).forall(_.isNullAt(2)))
    assert(tracked(2).getString(2) == "x")
    // the explicit mergeSchema read unions footers: same answer here
    val merged = TxTable.snapshot(spark, dir, mergeSchema = true)
      .orderBy("id").collect()
    assert(merged.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    assert(merged.take(2).forall(_.isNullAt(merged.head.fieldIndex("tag"))))
    assert(merged(2).getString(merged(2).fieldIndex("tag")) == "x")
    // compaction under the merged schema preserves the snapshot
    TxTable.compact(spark, dir)
    assert(TxTable.snapshot(spark, dir, mergeSchema = true).count() == 3)
  }

  test("checkpoints bound read work: replay starts at the latest ckpt <= the read version") {
    val dir = freshDir()
    (0 until 18).foreach(i => TxTable.append(spark, dir, rows(i * 2, i * 2 + 2)))
    val log = java.nio.file.Paths.get(dir, "_log")
    assert(java.nio.file.Files.exists(log.resolve("0" * 19 + "8.ckpt")))
    assert(java.nio.file.Files.exists(log.resolve("0" * 18 + "16.ckpt")))
    // tip read seeds from v16; mid-history from v8; pre-checkpoint from scratch
    assert(TxTable.replayBase(spark, dir) == 16L)
    assert(TxTable.replayBase(spark, dir, Some(12L)) == 8L)
    assert(TxTable.replayBase(spark, dir, Some(7L)) == 0L)
    // content identical on both sides of every checkpoint boundary
    assert(ids(TxTable.snapshot(spark, dir)) == (0L until 36L))
    assert(ids(TxTable.snapshot(spark, dir, Some(8L))) == (0L until 16L))
    assert(ids(TxTable.snapshot(spark, dir, Some(7L))) == (0L until 14L))
    // checkpoints are ADDITIVE: every log entry still present
    assert(TxTable.versions(spark, dir) == (1L to 18L))
  }

  test("checkpoints carry removes and the txn ledger across the boundary") {
    val dir = freshDir()
    (0 until 6).foreach(i =>
      TxTable.appendTxn(spark, dir, rows(i * 2, i * 2 + 2), "w", i.toLong))
    TxTable.delete(spark, dir, col("id") < 4) // v7 removes rows 0..3
    TxTable.appendTxn(spark, dir, rows(100, 102), "w", 6L) // v8 → checkpoint
    assert(TxTable.replayBase(spark, dir) == 8L)
    // the ledger survives the checkpoint seed (replay never revisits v1..v8)
    assert(TxTable.lastTxn(spark, dir, "w").contains(6L))
    assert(TxTable.appendTxn(spark, dir, rows(999, 1000), "w", 6L).isEmpty,
      "a replayed txn id must be skipped when the ledger comes from a checkpoint")
    // the delete's removes survive the checkpoint seed
    assert(ids(TxTable.snapshot(spark, dir)) ==
      ((4L until 12L) ++ Seq(100L, 101L)).sorted)
  }

  test("stats + snapshotRange: non-overlapping directories are pruned from the scan") {
    val dir = freshDir()
    (0 until 5).foreach { i =>
      TxTable.append(spark, dir, rows(i * 100, i * 100 + 10), statsCols = Seq("id"))
    }
    val full = TxTable.snapshot(spark, dir)
    val ranged = TxTable.snapshotRange(spark, dir, "id", 105L, 210L)
    // result == unpruned scan + filter …
    assert(ids(ranged) == ids(full.filter(col("id") >= 105 && col("id") <= 210)))
    // … but the scan only reads the 2 overlapping directories of 5
    assert(full.inputFiles.length > ranged.inputFiles.length)
    val liveWithStats = TxTable.liveDirStats(spark, dir)
    assert(liveWithStats.size == 5 && liveWithStats.values.forall(_.contains("id")))
    val keptDirs = ranged.inputFiles.flatMap(f =>
      "data/[^/]+".r.findFirstIn(f)).distinct
    assert(keptDirs.length == 2, s"expected 2 surviving dirs, got ${keptDirs.toSeq}")
  }

  test("stats are optional and safe: a statless directory is never pruned") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 10), statsCols = Seq("id"))
    TxTable.append(spark, dir, rows(500, 510)) // no stats recorded
    val ranged = TxTable.snapshotRange(spark, dir, "id", 505L, 506L)
    assert(ids(ranged) == Seq(505L, 506L),
      "rows in the statless dir must survive pruning")
    // a fully out-of-range request over all-stats dirs returns empty
    val none = TxTable.snapshotRange(spark, dir, "id", 9000L, 9999L)
    assert(none.count() == 0L)
  }

  test("merge: CDC upsert/delete lands as one copy-on-write commit, history intact") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 6)) // (id, v = id*10)
    val log = Seq(
      (1L, 999L, "U", 1L, 1L),  // update id 1
      (2L, 111L, "U", 1L, 1L),  // first write for id 2 …
      (2L, 222L, "U", 2L, 1L),  // … superseded: later ts wins
      (3L, 0L,   "D", 1L, 1L),  // delete id 3
      (50L, 500L, "U", 1L, 1L)  // insert a key the table lacks
    ).toDF("id", "v", "op", "ts", "seq")
    val v = TxTable.merge(spark, dir, log,
      keyCols = Seq("id"), orderCols = Seq("ts", "seq"))
    assert(v == 2L)
    val got = TxTable.snapshot(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 999L, 2L -> 222L, 4L -> 40L, 5L -> 50L, 50L -> 500L))
    // pre-merge version still readable (copy-on-write, not in-place)
    assert(ids(TxTable.snapshot(spark, dir, Some(1L))) == (0L until 6L))
  }

  test("merge with key-stats pruning: key-disjoint directories untouched, answer unchanged") {
    val dir = freshDir()
    (0 until 3).foreach(i =>
      TxTable.append(spark, dir, rows(i * 100, i * 100 + 10), statsCols = Seq("id")))
    val liveBefore = TxTable.liveDirs(spark, dir)
    // log span [105, 250]: dir0 (0-9) is provably key-disjoint
    val log = Seq(
      (105L, -5L, "U", 1L, 1L),
      (203L, 0L, "D", 1L, 1L),
      (250L, -9L, "U", 1L, 1L) // insert inside the span
    ).toDF("id", "v", "op", "ts", "seq")
    TxTable.merge(spark, dir, log, Seq("id"), Seq("ts", "seq"),
      statsCols = Seq("id"), pruneByKeyStats = true)
    val liveAfter = TxTable.liveDirs(spark, dir)
    assert(liveAfter.contains(liveBefore(0)),
      "a directory whose key range cannot meet the log must not be rewritten")
    assert(!liveAfter.contains(liveBefore(1)) && !liveAfter.contains(liveBefore(2)))
    val got = TxTable.snapshot(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = ((0L until 10L) ++ (100L until 110L) ++ (200L until 210L))
      .map(i => i -> i * 10).toMap ++
      Map(105L -> -5L, 250L -> -9L) - 203L
    assert(got == want, "pruned merge must equal the full-rewrite semantics")
  }

  test("replaceRange: disjoint directories untouched, overlapping rewritten to survivors") {
    val dir = freshDir()
    (0 until 4).foreach(i =>
      TxTable.append(spark, dir, rows(i * 100, i * 100 + 10), statsCols = Seq("id")))
    val liveBefore = TxTable.liveDirs(spark, dir)
    // [105, 215] overlaps dir1 (100-109, partially) and dir2 (200-209,
    // fully); dir0 and dir3 are provably disjoint by their stats
    val repl = Seq((105L, -1L), (150L, -2L)).toDF("id", "v")
    assert(TxTable.replaceRange(spark, dir, repl, "id", 105L, 215L,
      statsCols = Seq("id")) == 5L)
    val liveAfter = TxTable.liveDirs(spark, dir)
    assert(liveAfter.contains(liveBefore(0)) && liveAfter.contains(liveBefore(3)),
      "stats-disjoint directories must be left untouched (not rewritten)")
    assert(!liveAfter.contains(liveBefore(1)) && !liveAfter.contains(liveBefore(2)))
    val got = TxTable.snapshot(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want =
      ((0L until 10L) ++ (300L until 310L) ++ (100L until 105L))
        .map(i => i -> i * 10).toMap ++ Map(105L -> -1L, 150L -> -2L)
    assert(got == want,
      "survivors below the range stay; fully-covered dir vanishes; replacement lands")
    // the replaceWhere constraint fails BEFORE anything publishes
    intercept[IllegalArgumentException] {
      TxTable.replaceRange(spark, dir, Seq((999L, 0L)).toDF("id", "v"),
        "id", 105L, 215L)
    }
    assert(TxTable.versions(spark, dir).last == 5L,
      "a failed constraint must not commit")
    // pre-replace version still readable (copy-on-write, not in-place)
    assert(ids(TxTable.snapshot(spark, dir, Some(4L))) ==
      (0 until 4).flatMap(i => i * 100L until i * 100L + 10).sorted)
  }

  test("merge hammer: racing merges/appends either land consistently or abort cleanly") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 4))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val unexpected = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val appended = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val mergedVs = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    try {
      val tasks = (0 until 8).map { t =>
        pool.submit(new Runnable {
          def run(): Unit =
            try {
              if (t % 2 == 0) { // appenders: always land (retry path)
                val base = 1000L * (t + 1)
                TxTable.append(spark, dir, rows(base, base + 2))
                appended.add(base)
              } else { // mergers: land at read+1 or abort on conflict
                val log = Seq((t.toLong % 4, 7777L, "U", 9L, t.toLong))
                  .toDF("id", "v", "op", "ts", "seq")
                try mergedVs.add(TxTable.merge(spark, dir, log,
                  keyCols = Seq("id"), orderCols = Seq("ts", "seq")))
                catch { case _: TxTable.CommitConflict => () } // legal outcome
              }
            } catch { case e: Throwable => unexpected.add(e) }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    assert(unexpected.isEmpty, s"unexpected failure: ${unexpected.peek()}")
    // versions contiguous; every successful append's rows present; no
    // row duplicated or resurrected by a merge rewrite
    val vs = TxTable.versions(spark, dir)
    assert(vs == (1L to vs.size))
    val got = ids(TxTable.snapshot(spark, dir))
    assert(got == got.distinct, "a merge rewrite must never duplicate rows")
    import scala.jdk.CollectionConverters._
    appended.asScala.foreach { base =>
      assert(got.contains(base.toLong) && got.contains(base.toLong + 1),
        s"append at $base was lost by a racing merge rewrite")
    }
    assert((0L until 4L).forall(got.contains), "base keys survive merges")
  }

  test("delete of every row leaves a READABLE empty snapshot (schema survives)") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 5))
    TxTable.delete(spark, dir, col("id") >= 0)
    val snap = TxTable.snapshot(spark, dir)
    assert(snap.count() == 0L)
    assert(snap.columns.toSeq == Seq("id", "v"))
    // and the table accepts further appends normally
    TxTable.append(spark, dir, rows(7, 9))
    assert(ids(TxTable.snapshot(spark, dir)) == Seq(7L, 8L))
  }

  test("compactSmall folds only sub-threshold dirs; the big directory is never rewritten") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 2000))      // big
    TxTable.append(spark, dir, rows(5000, 5002))   // small
    TxTable.append(spark, dir, rows(6000, 6002))   // small
    TxTable.append(spark, dir, rows(7000, 7002))   // small
    val before = TxTable.liveDirs(spark, dir)
    val bigRel = before.head
    val v = TxTable.compactSmall(spark, dir, smallBytes = 8 * 1024)
    assert(v.contains(5L))
    val after = TxTable.liveDirs(spark, dir)
    assert(after.contains(bigRel), "the big directory must stay untouched")
    assert(after.size == 2, s"3 small dirs fold into 1: $after")
    assert(ids(TxTable.snapshot(spark, dir)) ==
      ((0L until 2000L) ++ Seq(5000L, 5001L, 6000L, 6001L, 7000L, 7001L)).sorted)
    // below two small dirs: nothing to fold
    assert(TxTable.compactSmall(spark, dir, smallBytes = 8 * 1024).isEmpty)
  }

  test("vacuum reads its removal clock through checkpoints: retention survives the seed") {
    val dir = freshDir()
    (0 until 6).foreach(i => TxTable.append(spark, dir, rows(i * 10, i * 10 + 2)))
    TxTable.delete(spark, dir, col("id") < 20) // v7 removes early dirs
    TxTable.append(spark, dir, rows(900, 902)) // v8 → checkpoint carries removed: stamps
    assert(TxTable.replayBase(spark, dir) == 8L)
    // inside the horizon nothing is reclaimed, even though the replay
    // seeds AT the checkpoint (the removal stamps rode the ckpt lines)
    assert(TxTable.vacuum(spark, dir).isEmpty)
    assert(ids(TxTable.snapshot(spark, dir, Some(6L))) == (0L until 60L by 10L)
      .flatMap(b => Seq(b, b + 1)).sorted)
    // past the horizon the removed dirs go; live ones stay
    val reclaimed = TxTable.vacuum(spark, dir, horizonMs = -1L)
    assert(reclaimed.nonEmpty)
    assert(ids(TxTable.snapshot(spark, dir)) ==
      ((20L until 60L by 10L).flatMap(b => Seq(b, b + 1)) ++ Seq(900L, 901L)).sorted)
  }

  test("vacuum retention: removed dirs outlive the horizon window, then time travel ends") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 4))
    TxTable.delete(spark, dir, col("id") === 0)
    // inside the horizon: nothing reclaimed, v1 still readable
    assert(TxTable.vacuum(spark, dir).isEmpty)
    assert(ids(TxTable.snapshot(spark, dir, Some(1L))) == (0L until 4L))
    // past the horizon: the removed dir goes, the live one stays
    val reclaimed = TxTable.vacuum(spark, dir, horizonMs = -1L)
    assert(reclaimed.size == 1)
    assert(ids(TxTable.snapshot(spark, dir)) == Seq(1L, 2L, 3L))
    intercept[Exception] { TxTable.snapshot(spark, dir, Some(1L)).count() }
  }
}
