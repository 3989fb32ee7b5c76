package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The r15 TxTable surfaces: pointer-bounded log discovery + retention
  * ([[TxTable.cleanupLog]]), schema enforcement on write, string/date
  * stats with conjunctive pruning ([[TxTable.snapshotWhere]]),
  * multi-key typed merge pruning, write-then-validate replaceRange,
  * Z-order OPTIMIZE, the change data feed, and the maintenance pass.
  */
class TxTableMaintSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("txmaint").toString

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, i * 10)).toDF("id", "v")

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).sorted.toSeq

  import scala.jdk.CollectionConverters._

  private def logFiles(dir: String): Seq[String] = {
    val log = java.nio.file.Paths.get(dir, "_log")
    val st = java.nio.file.Files.list(log)
    try st.iterator().asScala.map(_.getFileName.toString)
      .filterNot(_.startsWith(".tmp")).toSeq.sorted
    finally st.close()
  }

  // ---------------------------------------------------------------
  // Pointer-bounded discovery + log retention
  // ---------------------------------------------------------------

  test("_last_checkpoint pointer tracks the newest checkpoint across 50 commits") {
    val dir = freshDir()
    (0 until 50).foreach(i => TxTable.append(spark, dir, rows(i, i + 1)))
    val ptr = java.nio.file.Paths.get(dir, "_log", "_last_checkpoint")
    assert(java.nio.file.Files.exists(ptr))
    assert(new String(java.nio.file.Files.readAllBytes(ptr)).trim.toLong == 48L)
    assert(TxTable.replayBase(spark, dir) == 48L)
    // a forced checkpoint advances the pointer to the tip
    assert(TxTable.checkpoint(spark, dir) == 50L)
    assert(new String(java.nio.file.Files.readAllBytes(ptr)).trim.toLong == 50L)
    assert(TxTable.replayBase(spark, dir) == 50L)
    assert(ids(TxTable.snapshot(spark, dir)) == (0L until 50L))
  }

  test("cleanupLog: reads survive on a CheckpointEvery-bounded file set; " +
      "time travel inside retention intact, outside it informative") {
    val dir = freshDir()
    (0 until 50).foreach(i => TxTable.append(spark, dir, rows(i, i + 1)))
    // a generous retention deletes nothing and every version still reads
    assert(TxTable.cleanupLog(spark, dir, retainMs = 24L * 3600 * 1000).isEmpty)
    assert(ids(TxTable.snapshot(spark, dir, Some(7L))) == (0L until 7L))
    // zero retention reclaims every entry/ckpt below the pointer (48):
    // what remains is entries 48..50 + ckpt 48 (text + columnar twin) +
    // the pointer — a read can touch at most a CheckpointEvery-bounded
    // file set, not the 50-commit history
    val cleaned = TxTable.cleanupLog(spark, dir, retainMs = 0L)
    assert(cleaned.nonEmpty)
    assert(logFiles(dir).size == 6, s"got ${logFiles(dir)}")
    assert(ids(TxTable.snapshot(spark, dir)) == (0L until 50L))
    assert(TxTable.versions(spark, dir) == Seq(48L, 49L, 50L))
    // the pointer's checkpoint version itself stays readable (it seeds
    // with zero replay), as does everything after it
    assert(ids(TxTable.snapshot(spark, dir, Some(48L))) == (0L until 48L))
    assert(ids(TxTable.snapshot(spark, dir, Some(49L))) == (0L until 49L))
    // a version whose entries were reclaimed fails with the log-retention
    // error, not a bare FileNotFound
    val e = intercept[IllegalStateException] {
      TxTable.snapshot(spark, dir, Some(47L)).collect()
    }
    assert(e.getMessage.contains("no longer reconstructible"))
    // appends keep working after cleanup
    TxTable.append(spark, dir, rows(100, 101))
    assert(ids(TxTable.snapshot(spark, dir)) == ((0L until 50L) :+ 100L))
  }

  // ---------------------------------------------------------------
  // Schema enforcement on write
  // ---------------------------------------------------------------

  test("schema gate: type conflicts and dropped columns are rejected before any write") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 3))
    val conflict = intercept[IllegalArgumentException] {
      TxTable.append(spark, dir, Seq(("x", 1L)).toDF("id", "v"))
    }
    assert(conflict.getMessage.contains("type conflict"))
    val dropped = intercept[IllegalArgumentException] {
      TxTable.append(spark, dir, Seq(Tuple1(9L)).toDF("id"))
    }
    assert(dropped.getMessage.contains("drop"))
    val extra = intercept[IllegalArgumentException] {
      TxTable.appendTxn(spark, dir, Seq((9L, 9L, "t")).toDF("id", "v", "tag"), "w", 1L)
    }
    assert(extra.getMessage.contains("allowAdditive"))
    // nothing committed by any refusal
    assert(TxTable.versions(spark, dir) == Seq(1L))
    // appendTxn under the additive opt-in commits
    assert(TxTable.appendTxn(spark, dir, Seq((9L, 9L, "t")).toDF("id", "v", "tag"),
      "w", 1L, allowAdditive = true).contains(2L))
    // a merge log carrying an unexpected extra column is refused too
    // (op/order columns are contractually exempt)
    val badLog = Seq((1L, 5L, "U", 1L, "oops")).toDF("id", "v", "op", "ts", "junk")
    intercept[IllegalArgumentException] {
      TxTable.merge(spark, dir, badLog, Seq("id"), Seq("ts"))
    }
  }

  // ---------------------------------------------------------------
  // String/date stats + conjunctive pruning
  // ---------------------------------------------------------------

  private def tagged(lo: Long, hi: Long, tag: String) =
    (lo until hi).map(i => (i, i * 10, tag)).toDF("id", "v", "tag")

  test("string stats + snapshotWhere: conjunctive pruning on (string, long), answer exact") {
    val dir = freshDir()
    Seq("alpha", "beta", "gamma", "delta").zipWithIndex.foreach { case (t, i) =>
      TxTable.append(spark, dir, tagged(i * 100, i * 100 + 10, t),
        statsCols = Seq("id", "tag"))
    }
    val full = TxTable.snapshot(spark, dir)
    val got = TxTable.snapshotWhere(spark, dir,
      Seq(TxTable.strEq("tag", "beta"), TxTable.LongRange("id", 0L, 500L)))
    assert(ids(got) == (100L until 110L))
    // only beta's directory survives the conjunction (alpha/gamma/delta
    // are string-disjoint even though their id ranges overlap [0,500])
    assert(got.inputFiles.length < full.inputFiles.length)
    val kept = got.inputFiles.flatMap("data/[^/]+".r.findFirstIn(_)).distinct
    assert(kept.length == 1, s"expected 1 surviving dir, got ${kept.toSeq}")
    // a range spanning two tags keeps exactly those two
    val two = TxTable.snapshotWhere(spark, dir,
      Seq(TxTable.StrRange("tag", "alpha", "beta")))
    assert(ids(two) == ((0L until 10L) ++ (100L until 110L)))
    // pruning is an optimization, never a correctness input: a LongRange
    // against a string-stat column keeps everything
    assert(ids(TxTable.snapshotWhere(spark, dir,
      Seq(TxTable.LongRange("id", 0L, 1000L)))) == ids(full))
  }

  test("string stats truncation: a >64-char value leaves the upper bound open (never misprunes)") {
    val dir = freshDir()
    val longTag = "z" * 100
    TxTable.append(spark, dir, Seq((1L, 10L, "apple"), (2L, 20L, longTag))
      .toDF("id", "v", "tag"), statsCols = Seq("tag"))
    val ss = TxTable.liveDirStringStats(spark, dir)
    assert(ss.size == 1)
    val (lo, hi) = ss.head._2("tag")
    assert(lo == "apple" && hi.isEmpty, s"got ($lo, $hi)")
    // the open upper bound keeps the dir for any range at or above lo
    assert(ids(TxTable.snapshotWhere(spark, dir,
      Seq(TxTable.StrRange("tag", "za", "zz~")))) == Seq(2L))
    // while a range strictly below lo prunes it
    val below = TxTable.snapshotWhere(spark, dir,
      Seq(TxTable.StrRange("tag", "aa", "ab")))
    assert(below.count() == 0)
  }

  test("date stats: snapshotRange prunes and filters a DateType column through epoch days") {
    val dir = freshDir()
    (0 until 3).foreach { m =>
      val df = (0 until 10).map { i =>
        (m * 10L + i, java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(m * 100L + i)))
      }.toDF("id", "d")
      TxTable.append(spark, dir, df, statsCols = Seq("d"))
    }
    val full = TxTable.snapshot(spark, dir)
    // [100, 109] covers exactly the second append's dates
    val got = TxTable.snapshotRange(spark, dir, "d", 100L, 109L)
    assert(ids(got) == (10L until 20L))
    assert(got.inputFiles.length < full.inputFiles.length)
    // the residual compares the DateType column against date literals,
    // so it reaches the parquet scan as a pushed filter (row-group
    // pruning inside the surviving directories)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      """PushedFilters: \[[^\]]*GreaterThanOrEqual\(d""".r.findFirstIn(plan).isDefined,
      s"date residual must push down, plan was:\n$plan")
  }

  // ---------------------------------------------------------------
  // Merge pruning: typed guard, empty log, composite keys
  // ---------------------------------------------------------------

  test("merge pruneByKeyStats: composite keys prune on ANY disjoint column; " +
      "non-castable keys are refused; all-null keys do NOT degrade to an empty-log no-op") {
    val dir = freshDir()
    // two dirs split on k2 (string), overlapping on k1 (long)
    TxTable.append(spark, dir,
      (0L until 10L).map(i => (i, "left", i)).toDF("k1", "k2", "v"),
      statsCols = Seq("k1", "k2"))
    TxTable.append(spark, dir,
      (0L until 10L).map(i => (i, "right", i * 100)).toDF("k1", "k2", "v"),
      statsCols = Seq("k1", "k2"))
    val liveBefore = TxTable.liveDirs(spark, dir)
    val log = Seq((3L, "right", -1L, "U", 1L)).toDF("k1", "k2", "v", "op", "ts")
    TxTable.merge(spark, dir, log, Seq("k1", "k2"), Seq("ts"),
      statsCols = Seq("k1", "k2"), pruneByKeyStats = true)
    val liveAfter = TxTable.liveDirs(spark, dir)
    assert(liveAfter.contains(liveBefore(0)),
      "k2-disjoint directory must be untouched even though k1 overlaps")
    assert(!liveAfter.contains(liveBefore(1)))
    val got = TxTable.snapshot(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got((3L, "right")) == -1L && got((3L, "left")) == 3L)
    // type guard: a key column stats can never describe is an error, not
    // a silent full rewrite or a silent no-op (the r14 advice)
    val adir = freshDir()
    TxTable.append(spark, adir, Seq((Seq(1L), 0L)).toDF("k", "v"))
    val arrLog = Seq((Seq(1L), 9L, "U", 1L)).toDF("k", "v", "op", "ts")
    val guard = intercept[IllegalArgumentException] {
      TxTable.merge(spark, adir, arrLog, Seq("k"), Seq("ts"), pruneByKeyStats = true)
    }
    assert(guard.getMessage.contains("pruneByKeyStats"))
  }

  test("merge schema evolution: a log with NEW value columns widens the " +
      "table under allowAdditive and is rejected without") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 4)) // (id, v)
    val log = Seq((1L, 111L, "fresh", "U", 9L, 1L))
      .toDF("id", "v", "note", "op", "ts", "seq")
    // default: additive columns are a schema violation, nothing commits
    intercept[IllegalArgumentException] {
      TxTable.merge(spark, dir, log, keyCols = Seq("id"), orderCols = Seq("ts", "seq"))
    }
    assert(TxTable.versions(spark, dir).last == 1L)
    // opt-in: the upsert lands with the new column, survivors keep
    // their own schema and read it as null, the schema action widens
    TxTable.merge(spark, dir, log, keyCols = Seq("id"),
      orderCols = Seq("ts", "seq"), allowAdditive = true)
    val snap = TxTable.snapshot(spark, dir, mergeSchema = true)
    assert(snap.columns.sorted.toSeq == Seq("id", "note", "v"))
    val byId = snap.collect().map(r =>
      r.getLong(0) -> (r.getLong(snap.columns.indexOf("v")),
        Option(r.getString(snap.columns.indexOf("note"))))).toMap
    assert(byId(1L) == ((111L, Some("fresh"))))
    assert(byId(0L)._2.isEmpty && byId(2L)._2.isEmpty)
    // the widened schema is the tracked action: a follow-up append
    // carrying the new column needs no allowAdditive
    TxTable.append(spark, dir,
      Seq((50L, 500L, "later")).toDF("id", "v", "note"))
    assert(TxTable.snapshot(spark, dir, mergeSchema = true).count() == 5L)
  }

  test("merge pruneByKeyStats: all-null key values still apply the log (r14 advice)") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 5), statsCols = Seq("id"))
    // an all-null-key log must NOT be conflated with an empty log: its
    // 'U' winners insert (null never equality-joins, so no dir is
    // rewritten, but the rows land)
    val log = Seq((Option.empty[Long], 999L, "U", 1L)).toDF("id", "v", "op", "ts")
    TxTable.merge(spark, dir, log, Seq("id"), Seq("ts"), pruneByKeyStats = true)
    val snap = TxTable.snapshot(spark, dir)
    assert(snap.count() == 6L)
    assert(snap.filter(col("id").isNull).count() == 1L)
    // and a genuinely empty log commits and touches nothing
    val liveBefore = TxTable.liveDirs(spark, dir)
    TxTable.merge(spark, dir, log.filter(lit(false)), Seq("id"), Seq("ts"),
      pruneByKeyStats = true)
    assert(TxTable.liveDirs(spark, dir).toSet.intersect(liveBefore.toSet) == liveBefore.toSet)
    assert(TxTable.snapshot(spark, dir).count() == 6L)
  }

  // ---------------------------------------------------------------
  // replaceRange: write-then-validate
  // ---------------------------------------------------------------

  test("replaceRange violation: nothing commits and the written directory is reclaimed") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 10))
    intercept[IllegalArgumentException] {
      TxTable.replaceRange(spark, dir, Seq((999L, 0L)).toDF("id", "v"), "id", 0L, 5L)
    }
    assert(TxTable.versions(spark, dir) == Seq(1L))
    // the violating write is deleted immediately, not left as crash debris
    val dataDirs = java.nio.file.Files.list(java.nio.file.Paths.get(dir, "data"))
    try assert(dataDirs.iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      .asScala.size == 1)
    finally dataDirs.close()
  }

  // ---------------------------------------------------------------
  // OPTIMIZE ZORDER
  // ---------------------------------------------------------------

  test("optimizeZorder: snapshot-neutral, per-directory stats narrow in BOTH dimensions") {
    val dir = freshDir()
    // two overlapping appends, both spanning the full range of both
    // dims — no pruning possible before the optimize
    val all = (0L until 1000L).map(i => (i, (i * 37) % 1000))
    TxTable.append(spark, dir, all.filter(_._1 % 2 == 0).toDF("id", "v"),
      statsCols = Seq("id", "v"))
    TxTable.append(spark, dir, all.filter(_._1 % 2 == 1).toDF("id", "v"),
      statsCols = Seq("id", "v"))
    val before = TxTable.snapshot(spark, dir).orderBy("id", "v").collect().toSeq
    assert(TxTable.optimizeZorder(spark, dir, Seq("id", "v"), outDirs = 4).contains(3L))
    val after = TxTable.snapshot(spark, dir).orderBy("id", "v").collect().toSeq
    assert(after == before, "OPTIMIZE must be snapshot-neutral")
    // pre-optimize versions still read (pure layout, copy-on-write)
    assert(TxTable.snapshot(spark, dir, Some(2L)).count() == 1000L)
    val stats = TxTable.liveDirStats(spark, dir)
    assert(stats.size >= 3, s"expected >=3 clustered dirs, got ${stats.size}")
    // z-quartiles over two uniform dims ≈ quadrants: every directory's
    // footprint must be well under the global span in EACH dimension —
    // the property a 1-D sort cannot give on its trailing column
    stats.values.foreach { m =>
      val (idLo, idHi) = m("id")
      val (vLo, vHi) = m("v")
      assert(idHi - idLo <= 750, s"id span too wide: $idLo..$idHi")
      assert(vHi - vLo <= 750, s"v span too wide: $vLo..$vHi")
    }
    // and the conjunctive pruned read now actually skips directories
    val full = TxTable.snapshot(spark, dir)
    val corner = TxTable.snapshotWhere(spark, dir,
      Seq(TxTable.LongRange("id", 0L, 200L), TxTable.LongRange("v", 0L, 200L)))
    assert(corner.inputFiles.length < full.inputFiles.length)
    assert(ids(corner) ==
      all.filter(p => p._1 <= 200 && p._2 <= 200).map(_._1).sorted)
  }

  test("optimizeZorder(smallBytes): only the sub-threshold tail is re-clustered") {
    val dir = freshDir()
    val all = (0L until 20000L).map(i => (i, (i * 37) % 20000))
    TxTable.append(spark, dir, all.toDF("id", "v"), statsCols = Seq("id", "v"))
    TxTable.optimizeZorder(spark, dir, Seq("id", "v"), outDirs = 4) // big clustered base
    val base = TxTable.liveDirs(spark, dir)
    // two small micro-batch appends land on top
    TxTable.append(spark, dir, Seq((2000L, 1L), (2001L, 2L)).toDF("id", "v"),
      statsCols = Seq("id", "v"))
    TxTable.append(spark, dir, Seq((2002L, 3L)).toDF("id", "v"),
      statsCols = Seq("id", "v"))
    val beforeRows = ids(TxTable.snapshot(spark, dir))
    // a 4 KiB threshold folds only the two tiny dirs
    val v = TxTable.optimizeZorder(spark, dir, Seq("id", "v"), outDirs = 1,
      smallBytes = Some(4096L))
    assert(v.isDefined)
    val after = TxTable.liveDirs(spark, dir)
    assert(base.forall(after.contains),
      "the accumulated clustered base must never be rewritten by the incremental pass")
    assert(after.size == base.size + 1, "two tail dirs folded into one clustered slice")
    assert(ids(TxTable.snapshot(spark, dir)) == beforeRows)
    // one remaining small dir: a clean no-op
    assert(TxTable.optimizeZorder(spark, dir, Seq("id", "v"), outDirs = 1,
      smallBytes = Some(4096L)).isEmpty)
  }

  // ---------------------------------------------------------------
  // Change data feed
  // ---------------------------------------------------------------

  test("tableChanges: append → insert rows, delete → delete rows, layout commits invisible") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 10))   // v1
    TxTable.append(spark, dir, rows(10, 20))  // v2
    TxTable.delete(spark, dir, col("id") >= 15L) // v3
    TxTable.compact(spark, dir)               // v4 (no live-set change: 1 dir) — may no-op
    def changes(a: Long, b: Long) = TxTable.tableChanges(spark, dir, a, b)
      .collect().map(r => (r.getLong(0), r.getString(r.fieldIndex("_change_type"))))
      .sortBy(identity).toSeq
    assert(changes(1, 2) == (10L until 20L).map(i => (i, "insert")))
    assert(changes(2, 3) == (15L until 20L).map(i => (i, "delete")))
    assert(changes(1, 1).isEmpty)
    // net feed across the whole window: the delete cancels part of the
    // v2 insert
    assert(changes(1, 3) == (10L until 15L).map(i => (i, "insert")))
    // a compaction between the versions is change-invisible even though
    // it rewrites directories
    TxTable.append(spark, dir, rows(20, 22)) // v4 or v5
    val tip = TxTable.versions(spark, dir).last
    TxTable.compact(spark, dir)
    val tip2 = TxTable.versions(spark, dir).last
    assert(TxTable.tableChanges(spark, dir, tip, tip2).count() == 0L)
  }

  test("timestamp time travel: versionAt resolves by commit mtime; snapshotAsOf reads it") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 3))
    Thread.sleep(30)
    val betweenTs = System.currentTimeMillis()
    Thread.sleep(30)
    TxTable.append(spark, dir, rows(3, 6))
    assert(TxTable.versionAt(spark, dir, betweenTs) == 1L)
    assert(TxTable.versionAt(spark, dir, System.currentTimeMillis()) == 2L)
    assert(ids(TxTable.snapshotAsOf(spark, dir, betweenTs)) == (0L until 3L))
    // a timestamp before the table existed fails informatively
    val e = intercept[IllegalArgumentException] {
      TxTable.versionAt(spark, dir, betweenTs - 3600L * 1000)
    }
    assert(e.getMessage.contains("predates"))
  }

  test("protocol guard: a table written under a newer log protocol refuses to read") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 3))
    // first commit recorded the protocol; current-engine reads work
    assert(ids(TxTable.snapshot(spark, dir)) == (0L until 3L))
    // a newer writer bumps the protocol in a later commit
    TxTable.publishAt(spark, dir, 2L, Seq("op:upgrade", "protocol:99"))
    val e = intercept[IllegalStateException] {
      TxTable.snapshot(spark, dir).collect()
    }
    assert(e.getMessage.contains("protocol"))
    // pre-upgrade versions still read: the guard is per-replayed-line
    assert(ids(TxTable.snapshot(spark, dir, Some(1L))) == (0L until 3L))
  }

  // ---------------------------------------------------------------
  // Maintenance pass
  // ---------------------------------------------------------------

  // ---------------------------------------------------------------
  // Per-version CDF, restore, constraints
  // ---------------------------------------------------------------

  test("tableChangesByVersion: per-commit attribution; compaction slices are empty") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 5))      // v1
    TxTable.append(spark, dir, rows(5, 8))      // v2
    TxTable.compact(spark, dir)                 // v3 — layout only
    TxTable.delete(spark, dir, col("id") < 2L)  // v4
    val got = TxTable.tableChangesByVersion(spark, dir, 1L, 4L)
      .collect().map(r => (r.getLong(r.fieldIndex("_commit_version")),
        r.getLong(0), r.getString(r.fieldIndex("_change_type"))))
      .sortBy(t => (t._1, t._2, t._3)).toSeq
    val want =
      (5L until 8L).map(i => (2L, i, "insert")) ++
      (0L until 2L).map(i => (4L, i, "delete"))
    assert(got == want, s"got $got")
    // the empty window shape
    assert(TxTable.tableChangesByVersion(spark, dir, 2L, 2L).count() == 0L)
  }

  test("restore: metadata-only rollback, history intact, stats and schema re-recorded") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 10), statsCols = Seq("id"))   // v1
    TxTable.append(spark, dir, rows(10, 20), statsCols = Seq("id"))  // v2
    TxTable.delete(spark, dir, col("id") >= 5L)                      // v3
    val v = TxTable.restore(spark, dir, 2L)                          // v4
    assert(v == 4L)
    assert(ids(TxTable.snapshot(spark, dir)) == (0L until 20L))
    // the rolled-back version stays readable — restore keeps history
    assert(ids(TxTable.snapshot(spark, dir, Some(3L))) == (0L until 5L))
    // the restored directories carry their stats again (pruning works)
    val ranged = TxTable.snapshotRange(spark, dir, "id", 12L, 15L)
    assert(ids(ranged) == (12L to 15L))
    // the CDF sees the restore as re-inserts of the deleted rows
    val restored = TxTable.tableChanges(spark, dir, 3L, 4L)
      .collect().map(r => (r.getLong(0), r.getString(r.fieldIndex("_change_type"))))
      .sortBy(identity).toSeq
    assert(restored == (5L until 20L).map(i => (i, "insert")))
    // restore past the retention window fails informatively
    TxTable.delete(spark, dir, col("id") >= 15L)  // v5: makes v4's extra dirs removable
    Thread.sleep(15)
    TxTable.vacuum(spark, dir, horizonMs = 0L)
    val e = intercept[IllegalArgumentException] {
      TxTable.restore(spark, dir, 2L)
    }
    assert(e.getMessage.contains("vacuum"))
  }

  test("CHECK constraints: validated on add, enforced on every write shape, droppable") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 5))
    // adding a constraint the existing rows violate is rejected
    val bad = intercept[IllegalArgumentException] {
      TxTable.addConstraint(spark, dir, "v_big", "v >= 100")
    }
    assert(bad.getMessage.contains("existing rows violate"))
    assert(TxTable.constraints(spark, dir).isEmpty)
    // a satisfiable constraint lands as a log action
    TxTable.addConstraint(spark, dir, "v_nonneg", "v >= 0")
    assert(TxTable.constraints(spark, dir) == Map("v_nonneg" -> "v >= 0"))
    // conformant writes pass; violating writes are rejected pre-publish
    TxTable.append(spark, dir, rows(5, 8))
    val tipBefore = TxTable.versions(spark, dir).last
    val viol = intercept[IllegalArgumentException] {
      TxTable.append(spark, dir, Seq((99L, -1L)).toDF("id", "v"))
    }
    assert(viol.getMessage.contains("v_nonneg"))
    assert(TxTable.versions(spark, dir).last == tipBefore, "nothing published")
    intercept[IllegalArgumentException] {
      TxTable.merge(spark, dir,
        Seq((1L, -5L, "U", 1L)).toDF("id", "v", "op", "ts"), Seq("id"), Seq("ts"))
    }
    intercept[IllegalArgumentException] {
      TxTable.overwrite(spark, dir, Seq((1L, -5L)).toDF("id", "v"))
    }
    // null passes — SQL CHECK semantics
    TxTable.append(spark, dir,
      Seq((50L, Option.empty[Long])).toDF("id", "v"))
    // constraints survive a checkpoint (9+ commits) and then drop cleanly
    (0 until 6).foreach(i => TxTable.append(spark, dir, rows(100 + i, 101 + i)))
    assert(TxTable.replayBase(spark, dir) >= 8L)
    assert(TxTable.constraints(spark, dir) == Map("v_nonneg" -> "v >= 0"))
    TxTable.dropConstraint(spark, dir, "v_nonneg")
    assert(TxTable.constraints(spark, dir).isEmpty)
    TxTable.append(spark, dir, Seq((99L, -1L)).toDF("id", "v"))
    assert(TxTable.snapshot(spark, dir).filter(col("v") === -1L).count() == 1L)
  }

  test("maintain: compactSmall + checkpoint + vacuum + cleanupLog as one guarded pass") {
    val dir = freshDir()
    (0 until 12).foreach(i => TxTable.append(spark, dir, rows(i * 2, i * 2 + 2),
      statsCols = Seq("id")))
    Thread.sleep(25) // commit mtimes strictly before the horizon-0 cutoff
    val rep = TxTable.maintain(spark, dir,
      smallBytes = 1L << 30, horizonMs = 0L, logRetainMs = Some(0L))
    assert(rep.compactedVersion.contains(13L))
    assert(rep.checkpointedVersion == 13L)
    assert(rep.vacuumed.size == 12, "all twelve folded dirs reclaimed at horizon 0")
    assert(rep.logFilesCleaned.nonEmpty)
    assert(ids(TxTable.snapshot(spark, dir)) == (0L until 24L))
    // stats were CARRIED through the compaction (no statsCols passed)
    val stats = TxTable.liveDirStats(spark, dir)
    assert(stats.values.exists(_.contains("id")), "carried stats must survive compaction")
    // a second pass is a clean no-op shape: nothing small to fold twice
    val rep2 = TxTable.maintain(spark, dir,
      smallBytes = 1L, horizonMs = 0L, logRetainMs = Some(0L))
    assert(rep2.compactedVersion.isEmpty)
    assert(ids(TxTable.snapshot(spark, dir)) == (0L until 24L))
  }

  test("maintain(zorderCols): the daemon keeps the table CLUSTERED — the " +
      "micro-batch tail folds into Z-slices, the clustered base is untouched") {
    val dir = freshDir()
    val all = (0L until 20000L).map(i => (i, (i * 37) % 20000))
    TxTable.append(spark, dir, all.toDF("id", "v"), statsCols = Seq("id", "v"))
    TxTable.optimizeZorder(spark, dir, Seq("id", "v"), outDirs = 4)
    val base = TxTable.liveDirs(spark, dir)
    TxTable.append(spark, dir, Seq((2000L, 1L), (2001L, 2L)).toDF("id", "v"),
      statsCols = Seq("id", "v"))
    TxTable.append(spark, dir, Seq((2002L, 3L)).toDF("id", "v"),
      statsCols = Seq("id", "v"))
    val before = ids(TxTable.snapshot(spark, dir))
    val rep = TxTable.maintain(spark, dir, smallBytes = 4096L,
      horizonMs = 1L << 30, zorderCols = Seq("id", "v"), zorderOutDirs = 1)
    assert(rep.compactedVersion.isDefined, "the clustered fold must run")
    val after = TxTable.liveDirs(spark, dir)
    assert(base.forall(after.contains),
      "the accumulated clustered base must never be rewritten by the daemon")
    assert(after.size == base.size + 1, "the two tail dirs fold into one Z-slice")
    assert(ids(TxTable.snapshot(spark, dir)) == before)
    // the folded slice records stats on BOTH clustering columns
    val stats = TxTable.liveDirStats(spark, dir)
    val folded = after.filterNot(base.contains)
    assert(folded.forall(d => stats.get(d).exists(m =>
      m.contains("id") && m.contains("v"))))
  }
}
