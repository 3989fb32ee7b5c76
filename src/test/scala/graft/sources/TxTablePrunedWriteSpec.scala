package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The r16 TxTable surfaces: stats-pruned directory-granularity DELETE
  * ([[TxTable.deleteWhere]] — the r15 verdict's last O(table) write
  * path), stats CARRY through delete/merge rewrites, per-directory
  * MERGE rewrites preserving layout granularity, the bounded
  * [[TxTable.versionAt]] (binary search, never a listing walk), the
  * checkpoint-probe listing fallback (r15 advice, medium), total
  * pointer/protocol parsing, the `_commit_version` reservation, and
  * the serializable append gate (re-gated whenever the tip moved).
  */
class TxTablePrunedWriteSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("txprune").toString

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, i * 10)).toDF("id", "v")

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).sorted.toSeq

  private def dirFiles(dir: String, rel: String): Seq[String] = {
    val p = java.nio.file.Paths.get(dir, rel)
    val st = java.nio.file.Files.list(p)
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted
    } finally st.close()
  }

  // ---------------------------------------------------------------
  // Stats-pruned DELETE
  // ---------------------------------------------------------------

  test("deleteWhere: stats-disjoint directories keep their exact files and stats; " +
      "only overlapping directories rewrite; answer is the plain anti-filter") {
    val dir = freshDir()
    (0 until 5).foreach(i =>
      TxTable.append(spark, dir, rows(i * 100, i * 100 + 10), statsCols = Seq("id")))
    val liveBefore = TxTable.liveDirs(spark, dir)
    val filesBefore = liveBefore.map(d => d -> dirFiles(dir, d)).toMap
    // delete [205, 207] — only dir2 (200..209) can overlap
    TxTable.deleteWhere(spark, dir, Seq(TxTable.LongRange("id", 205L, 207L)))
    val liveAfter = TxTable.liveDirs(spark, dir)
    // four disjoint directories: same rel, same files, bit for bit
    Seq(0, 1, 3, 4).foreach { i =>
      assert(liveAfter.contains(liveBefore(i)),
        s"stats-disjoint dir $i must not be rewritten")
      assert(dirFiles(dir, liveBefore(i)) == filesBefore(liveBefore(i)),
        s"dir $i files must be untouched")
    }
    assert(!liveAfter.contains(liveBefore(2)), "the overlapping dir is rewritten")
    assert(liveAfter.size == 5)
    // content = the plain anti-filter
    assert(ids(TxTable.snapshot(spark, dir)) ==
      (0 until 5).flatMap(i => i * 100L until i * 100L + 10)
        .filterNot(i => i >= 205 && i <= 207).sorted)
    // stats survive EVERYWHERE (disjoint dirs verbatim, the rewritten
    // dir re-recorded by default — the carry rule), so pruned reads
    // stay pruned after the delete
    val stats = TxTable.liveDirStats(spark, dir)
    assert(stats.size == 5 && stats.values.forall(_.contains("id")),
      s"every live dir must still carry id stats, got ${stats.keySet}")
    val ranged = TxTable.snapshotRange(spark, dir, "id", 305L, 306L)
    val kept = ranged.inputFiles.flatMap("data/[^/]+".r.findFirstIn(_)).distinct
    assert(kept.length == 1, s"post-delete pruning must still bite: ${kept.toSeq}")
  }

  test("delete find-files: even WITHOUT stats, directories holding no matching row " +
      "are never rewritten") {
    val dir = freshDir()
    (0 until 4).foreach(i => TxTable.append(spark, dir, rows(i * 100, i * 100 + 10)))
    val liveBefore = TxTable.liveDirs(spark, dir)
    TxTable.delete(spark, dir, col("id") === 105L) // only dir1 holds a match
    val liveAfter = TxTable.liveDirs(spark, dir)
    Seq(0, 2, 3).foreach(i => assert(liveAfter.contains(liveBefore(i)),
      s"matchless dir $i must be untouched"))
    assert(!liveAfter.contains(liveBefore(1)))
    assert(ids(TxTable.snapshot(spark, dir)) ==
      (0 until 4).flatMap(i => i * 100L until i * 100L + 10).filter(_ != 105L).sorted)
    // a delete matching nothing rewrites nothing (still commits)
    val before2 = TxTable.liveDirs(spark, dir)
    TxTable.delete(spark, dir, col("id") === 99999L)
    assert(TxTable.liveDirs(spark, dir) == before2)
  }

  test("deleteWhere of every row leaves an empty, schema-typed, appendable table") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 5), statsCols = Seq("id"))
    TxTable.deleteWhere(spark, dir, Seq(TxTable.LongRange("id", 0L, 100L)))
    val snap = TxTable.snapshot(spark, dir)
    assert(snap.count() == 0L && snap.columns.toSeq == Seq("id", "v"))
    TxTable.append(spark, dir, rows(7, 9))
    assert(ids(TxTable.snapshot(spark, dir)) == Seq(7L, 8L))
  }

  test("delete under additive evolution: a predicate on the evolved column " +
      "reads pre-evolution directories as null and rewrites them correctly") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 3)) // no 'tag' column
    TxTable.append(spark, dir, Seq((10L, 100L, "drop"), (11L, 110L, "keep"))
      .toDF("id", "v", "tag"), allowAdditive = true)
    // tag IS NULL matches every pre-evolution row: that dir is touched
    // even though it lacks the column (the aligned-filter fallback)
    TxTable.delete(spark, dir, col("tag").isNull || col("tag") === "drop")
    val snap = TxTable.snapshot(spark, dir, mergeSchema = true)
    assert(ids(snap) == Seq(11L))
    assert(snap.filter(col("tag") === "keep").count() == 1L)
  }

  // ---------------------------------------------------------------
  // Per-directory MERGE: layout granularity + stats carry
  // ---------------------------------------------------------------

  test("merge rewrites each touched directory to its own survivors: layout " +
      "granularity preserved, stats carried, upserts in one new directory") {
    val dir = freshDir()
    (0 until 3).foreach(i =>
      TxTable.append(spark, dir, rows(i * 100, i * 100 + 10), statsCols = Seq("id")))
    val liveBefore = TxTable.liveDirs(spark, dir)
    // touches keys in dir1 AND dir2 (and inserts a fresh key); dir0 is
    // key-disjoint under pruning
    val log = Seq(
      (105L, -5L, "U", 1L, 1L),
      (203L, 0L, "D", 1L, 1L),
      (999L, -9L, "U", 1L, 1L)
    ).toDF("id", "v", "op", "ts", "seq")
    TxTable.merge(spark, dir, log, Seq("id"), Seq("ts", "seq"),
      pruneByKeyStats = true)
    val liveAfter = TxTable.liveDirs(spark, dir)
    assert(liveAfter.contains(liveBefore(0)), "key-disjoint dir untouched")
    assert(!liveAfter.contains(liveBefore(1)) && !liveAfter.contains(liveBefore(2)))
    // dir1 and dir2 each became their OWN survivors directory, plus one
    // upsert directory: 1 untouched + 2 rewrites + 1 upserts = 4 (never
    // a collapse into one directory)
    assert(liveAfter.size == 4, s"got ${liveAfter.size}: $liveAfter")
    // stats carried by DEFAULT (no statsCols passed): the survivor
    // rewrites keep their id ranges recorded, so the ranges stay narrow
    val stats = TxTable.liveDirStats(spark, dir)
    val survivorStats = liveAfter.filterNot(_ == liveBefore(0))
      .flatMap(d => stats.get(d)).flatMap(_.get("id"))
    assert(survivorStats.exists { case (lo, hi) => lo >= 100 && hi <= 109 },
      s"dir1's rewrite must carry a narrow id range, got $survivorStats")
    assert(survivorStats.exists { case (lo, hi) => lo >= 200 && hi <= 209 },
      s"dir2's rewrite must carry a narrow id range, got $survivorStats")
    // content equals the full-rewrite semantics
    val got = TxTable.snapshot(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = ((0L until 10L) ++ (100L until 110L) ++ (200L until 210L))
      .map(i => i -> i * 10).toMap ++ Map(105L -> -5L, 999L -> -9L) - 203L
    assert(got == want)
  }

  test("merge on a Z-ordered table: per-directory footprints stay narrow " +
      "in both dimensions after the merge") {
    val dir = freshDir()
    val all = (0L until 1000L).map(i => (i, (i * 37) % 1000))
    TxTable.append(spark, dir, all.toDF("id", "v"), statsCols = Seq("id", "v"))
    TxTable.optimizeZorder(spark, dir, Seq("id", "v"), outDirs = 4)
    // a small merge touching a handful of keys
    val log = Seq((5L, -1L, "U", 1L), (500L, -2L, "U", 1L), (995L, 0L, "D", 1L))
      .toDF("id", "v", "op", "ts")
    TxTable.merge(spark, dir, log, Seq("id"), Seq("ts"))
    // every surviving clustered slice keeps a narrow footprint: the
    // merge rewrote slices to their OWN survivors (carried stats), so
    // the Z-order investment survives
    val stats = TxTable.liveDirStats(spark, dir)
    val slices = stats.filter(_._2.contains("id")).filter(_._2.contains("v"))
    assert(slices.size >= 3, s"clustered slices must keep stats, got ${stats.size}")
    slices.values.foreach { m =>
      val (idLo, idHi) = m("id")
      val (vLo, vHi) = m("v")
      if (idHi - idLo > 0 && idHi < 5000) { // the upsert dir spans wide; slices narrow
        assert(idHi - idLo <= 750 || vHi - vLo <= 750,
          s"a rewritten slice went wide in BOTH dims: id $idLo..$idHi, v $vLo..$vHi")
      }
    }
    val got = TxTable.snapshot(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = all.toMap ++ Map(5L -> -1L, 500L -> -2L) - 995L
    assert(got == want)
  }

  // ---------------------------------------------------------------
  // Bounded TIMESTAMP AS OF
  // ---------------------------------------------------------------

  test("versionAt: binary search over constructed names — O(log tip) probes, " +
      "answer equals the linear mtime rule, cleaned logs still resolve") {
    val dir = freshDir()
    (0 until 30).foreach(i => TxTable.append(spark, dir, rows(i, i + 1)))
    val log = java.nio.file.Paths.get(dir, "_log")
    def mtimeOf(v: Long): Long =
      java.nio.file.Files.getLastModifiedTime(
        log.resolve("0" * (20 - v.toString.length) + v.toString)).toMillis
    // reference rule: the last version whose mtime <= ts
    def linear(ts: Long): Long =
      (1L to 30L).filter(v => mtimeOf(v) <= ts).max
    Seq(mtimeOf(10L), mtimeOf(17L), mtimeOf(30L), System.currentTimeMillis()).foreach { ts =>
      val (got, probes) = TxTable.versionAtProbed(spark, dir, ts)
      assert(got == linear(ts), s"versionAt($ts)")
      assert(probes <= 20, s"expected O(log 30) probes, spent $probes")
    }
    // after log retention the earliest-retained search kicks in
    TxTable.cleanupLog(spark, dir, retainMs = 0L)
    assert(TxTable.versions(spark, dir).head == 24L)
    val (got, probes) = TxTable.versionAtProbed(spark, dir, System.currentTimeMillis())
    assert(got == 30L && probes <= 20)
    // a timestamp before retained history fails informatively
    val e = intercept[IllegalArgumentException] {
      TxTable.versionAt(spark, dir, mtimeOf(30L) - 365L * 24 * 3600 * 1000)
    }
    assert(e.getMessage.contains("predates"))
  }

  // ---------------------------------------------------------------
  // Degraded-log resilience (r15 advice)
  // ---------------------------------------------------------------

  test("lost checkpoints: reads fall back past the probe window to any surviving " +
      "checkpoint, and cleanupLog's boundary is the surviving one — never bricked") {
    val dir = freshDir()
    (0 until 35).foreach(i => TxTable.append(spark, dir, rows(i, i + 1)))
    val log = java.nio.file.Paths.get(dir, "_log")
    // simulate two consecutive checkpoint writes lost in a crash: 24 and
    // 32 vanish, the pointer rolls back to the surviving one
    java.nio.file.Files.delete(log.resolve("0" * 18 + "24.ckpt"))
    java.nio.file.Files.delete(log.resolve("0" * 18 + "32.ckpt"))
    java.nio.file.Files.write(log.resolve("_last_checkpoint"), "16".getBytes("UTF-8"))
    // the tip read's fixed probe window [20..35] holds no checkpoint —
    // the listing fallback finds ckpt 16 and the table stays readable
    assert(ids(TxTable.snapshot(spark, dir)) == (0L until 35L))
    // retention reclaims below the SURVIVING checkpoint only
    TxTable.cleanupLog(spark, dir, retainMs = 0L)
    assert(TxTable.versions(spark, dir).head == 16L)
    assert(ids(TxTable.snapshot(spark, dir)) == (0L until 35L))
    assert(ids(TxTable.snapshot(spark, dir, Some(20L))) == (0L until 20L))
    // and with the pointer AHEAD of every surviving checkpoint (the
    // corrupt-hint case), cleanupLog must not reclaim what the
    // surviving seed needs
    java.nio.file.Files.write(log.resolve("_last_checkpoint"), "32".getBytes("UTF-8"))
    TxTable.cleanupLog(spark, dir, retainMs = 0L)
    assert(ids(TxTable.snapshot(spark, dir)) == (0L until 35L))
  }

  test("corrupt pointer and oversized protocol degrade informatively, never crash") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 3))
    val log = java.nio.file.Paths.get(dir, "_log")
    // a 20-digit all-digit pointer (past Long range — the r15 advice)
    // is a hint, so reads fall back and still work
    java.nio.file.Files.write(log.resolve("_last_checkpoint"),
      "99999999999999999999".getBytes("UTF-8"))
    assert(ids(TxTable.snapshot(spark, dir)) == (0L until 3L))
    assert(TxTable.append(spark, dir, rows(3, 4)) == 2L)
    // a >9-digit protocol version gets the informative protocol error,
    // not a NumberFormatException
    TxTable.publishAt(spark, dir, 3L, Seq("op:upgrade", "protocol:99999999999"))
    val e = intercept[IllegalStateException] { TxTable.snapshot(spark, dir).collect() }
    assert(e.getMessage.contains("protocol"))
  }

  test("_commit_version is reserved by the change data feed") {
    val dir = freshDir()
    TxTable.append(spark, dir,
      Seq((1L, 1L)).toDF("id", "_commit_version"))
    TxTable.append(spark, dir, Seq((2L, 2L)).toDF("id", "_commit_version"))
    val e = intercept[IllegalArgumentException] {
      TxTable.tableChanges(spark, dir, 1L, 2L).collect()
    }
    assert(e.getMessage.contains("_commit_version"))
  }

  // ---------------------------------------------------------------
  // Serializable append gate
  // ---------------------------------------------------------------

  test("append gate under racing overwrites: no type-conflicting directory ever " +
      "joins the live set (the gate re-runs whenever the tip moved)") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 2)) // schema (id: long, v: long)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    val unexpected = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    try {
      val tasks = (0 until 6).map { t =>
        pool.submit(new Runnable {
          def run(): Unit =
            try {
              if (t % 3 == 2) {
                // overwriter: replaces the schema wholesale (v: string);
                // abort on conflict is a legal outcome
                try TxTable.overwrite(spark, dir,
                  Seq((100L + t, s"s$t")).toDF("id", "v"))
                catch { case _: TxTable.CommitConflict => () }
              } else {
                // appender under the ORIGINAL long schema: must either
                // land (pre-overwrite) or be refused by the re-gate
                // (post-overwrite) — never land long data under the
                // string schema
                (0 until 2).foreach { i =>
                  try TxTable.append(spark, dir, rows(1000L * t + i, 1000L * t + i + 1))
                  catch { case e: IllegalArgumentException =>
                    assert(e.getMessage.contains("type conflict"), e.getMessage)
                  }
                }
              }
            } catch { case e: Throwable => unexpected.add(e) }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    assert(unexpected.isEmpty, s"unexpected failure: ${unexpected.peek()}")
    // the invariant: the live set is never schema-mixed — a mergeSchema
    // read of the tip analyzes and collects cleanly
    val snap = TxTable.snapshot(spark, dir, mergeSchema = true)
    snap.collect()
    // and the tracked schema action agrees with the live data's type
    val vType = snap.schema("v").dataType.simpleString
    assert(vType == "bigint" || vType == "string")
  }
}
