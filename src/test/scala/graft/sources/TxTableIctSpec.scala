package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** IN-COMMIT TIMESTAMPS (the Delta feature of the same name): every
  * commit records a `ts:` line — the log's OWN clock, clamped strictly
  * monotone — and TIMESTAMP AS OF resolves against it instead of file
  * mtimes, so copying / backing up / restoring a table (which rewrites
  * every mtime) no longer corrupts time travel. Plus [[TxTable.history]]
  * (DESCRIBE HISTORY) riding the same stamps.
  */
class TxTableIctSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("txict").toString

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, i * 10)).toDF("id", "v")

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).sorted.toSeq

  private def entryFiles(dir: String): Seq[java.nio.file.Path] = {
    val log = java.nio.file.Paths.get(dir, "_log")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(log).iterator().asScala.toSeq
      .filter(p => p.getFileName.toString.forall(_.isDigit))
      .sortBy(_.getFileName.toString)
  }

  test("every commit records a strictly monotone in-commit timestamp") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 2))
    TxTable.append(spark, dir, rows(2, 4))
    TxTable.delete(spark, dir, col("id") === 0L)
    TxTable.compact(spark, dir)
    val h = TxTable.history(spark, dir)
      .orderBy("version")
      .select("version", "timestamp_ms", "operation")
      .collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val ts = h.map(_.getLong(1)).toSeq
    assert(ts == ts.sorted && ts.distinct == ts,
      s"in-commit timestamps must be strictly increasing, got $ts")
    assert(h.map(_.getString(2)).toSeq ==
      Seq("append", "append", "delete", "compact"))
    // the stamp is in the entry itself, not filesystem metadata
    entryFiles(dir).foreach { p =>
      val body = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      assert(body.linesIterator.exists(_.startsWith("ts:")), p.toString)
    }
  }

  test("TIMESTAMP AS OF survives total mtime corruption (a table copy)") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 2))
    TxTable.append(spark, dir, rows(2, 4))
    TxTable.append(spark, dir, rows(4, 6))
    val byVersion = TxTable.history(spark, dir)
      .select("version", "timestamp_ms").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // simulate a backup/restore: every log file's mtime becomes one
    // meaningless constant (rsync/cp -r of the table directory)
    val bogus = java.nio.file.attribute.FileTime.fromMillis(1234567890123L)
    entryFiles(dir).foreach(p =>
      java.nio.file.Files.setLastModifiedTime(p, bogus))
    // resolution still answers from the log's own clock
    assert(TxTable.versionAt(spark, dir, byVersion(1L)) == 1L)
    assert(TxTable.versionAt(spark, dir, byVersion(2L)) == 2L)
    assert(TxTable.versionAt(spark, dir, byVersion(2L) + (byVersion(3L) - byVersion(2L)) / 2) == 2L)
    assert(TxTable.versionAt(spark, dir, byVersion(3L) + 1000L) == 3L)
    assert(ids(TxTable.snapshotAsOf(spark, dir, byVersion(2L))) == (0L until 4L))
    intercept[IllegalArgumentException] {
      TxTable.versionAt(spark, dir, byVersion(1L) - 1L)
    }
  }

  test("a mixed log (pre-feature entries without ts lines) stays totally " +
      "ordered across the upgrade boundary") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 2))
    TxTable.append(spark, dir, rows(2, 4))
    // strip the ts lines — these two entries now look pre-feature, and
    // their CLOCK is their mtime, planted safely in the past
    val past = System.currentTimeMillis() - 1000L * 60 * 60
    entryFiles(dir).zipWithIndex.foreach { case (p, i) =>
      val kept = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        .linesIterator.filterNot(_.startsWith("ts:")).mkString("\n") + "\n"
      java.nio.file.Files.write(p, kept.getBytes("UTF-8"))
      java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(past + i * 60000L))
    }
    // the next commit stamps ts = max(now, prev clock + 1): ordered
    TxTable.append(spark, dir, rows(4, 6))
    val h = TxTable.history(spark, dir).orderBy("version")
      .select("timestamp_ms").collect().map(_.getLong(0)).toSeq
    assert(h == h.sorted && h.distinct == h, s"mixed clocks must stay ordered: $h")
    // cuts resolve correctly on both sides of the boundary
    assert(TxTable.versionAt(spark, dir, past + 30000L) == 1L)
    assert(TxTable.versionAt(spark, dir, past + 90000L) == 2L)
    assert(TxTable.versionAt(spark, dir, h.last) == 3L)
  }

  test("cleanupLog ages by the IN-COMMIT clock: mtime corruption cannot " +
      "reclaim fresh history (r16 advice)") {
    val dir = freshDir()
    // 10 commits -> pointer at the v8 auto-checkpoint, 7 entries below it
    (0 until 10).foreach(i => TxTable.append(spark, dir, rows(i * 2, i * 2 + 2)))
    // a backup/restore rewrote every log mtime to the distant past; the
    // entries' OWN ts: lines still say "committed just now"
    val bogus = java.nio.file.attribute.FileTime.fromMillis(1234567890123L)
    entryFiles(dir).foreach(p =>
      java.nio.file.Files.setLastModifiedTime(p, bogus))
    // under mtime aging this would reclaim everything below the pointer;
    // the in-commit clock keeps all of it — no version lost to a copy
    assert(TxTable.cleanupLog(spark, dir, retainMs = 60L * 60 * 1000).isEmpty,
      "fresh commits must survive retention regardless of file mtimes")
    assert(TxTable.versions(spark, dir).size == 10)
    assert(ids(TxTable.snapshot(spark, dir, Some(3L))) == (0L until 6L))
    // retainMs = 0 reclaims below the checkpoint boundary by the same
    // clock (every commit ts is now in the past relative to the cutoff)
    val reclaimed = TxTable.cleanupLog(spark, dir, retainMs = 0L)
    assert(reclaimed.nonEmpty, "an expired prefix must reclaim")
    assert(TxTable.versions(spark, dir).min == 8L,
      "the reclaimed set is the prefix below the pointer's checkpoint")
    assert(ids(TxTable.snapshot(spark, dir)) == (0L until 20L))
  }

  test("history reports per-commit add/remove directory counts") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 4))
    TxTable.append(spark, dir, rows(4, 8))
    TxTable.compact(spark, dir)
    val h = TxTable.history(spark, dir).orderBy("version").collect()
    assert(h.map(r => (r.getInt(3), r.getInt(4))).toSeq ==
      Seq((1, 0), (1, 0), (1, 2)))
  }
}
