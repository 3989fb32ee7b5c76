package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** LOGICAL conflict resolution for read-dependent commits
  * ([[TxTable.publishReadDependent]] — the Delta check-and-retry
  * protocol): a lost commit race classifies the winning commits against
  * the transaction's declared read footprint and retries when every
  * winner is provably disjoint, aborting only on a REAL conflict. The
  * unit half drives the primitive directly with hand-staged winners
  * (deterministic interleavings); the integration half races real
  * operations and asserts the outcomes the protocol now GUARANTEES
  * (a compaction or delete beside a blind ingest always lands).
  */
class TxTableConflictSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("txconflict").toString

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, i * 10)).toDF("id", "v")

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).sorted.toSeq

  private def liveSet(dir: String): Set[String] =
    TxTable.liveDirs(spark, dir).toSet

  /** A read-dependent commit's line shape: rewrite `from` into a fresh
    * (already-written) directory — the compact/delete commit skeleton.
    */
  private def rewriteLines(dir: String, from: Seq[String], lo: Long, hi: Long)
      : (Seq[String], String) = {
    val rel = s"data/${java.util.UUID.randomUUID().toString.take(12)}"
    rows(lo, hi).write.parquet(s"$dir/$rel")
    (Seq("op:compact", s"add:$rel") ++ from.map(d => s"remove:$d"), rel)
  }

  // -----------------------------------------------------------------
  // Unit: the primitive against hand-staged winners
  // -----------------------------------------------------------------

  test("a blind append racing a row-neutral rewrite retries past it") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 4))
    val readV = 1L
    val sources = TxTable.liveDirs(spark, dir)
    // the winner: a blind append lands AFTER the rewrite's read
    TxTable.append(spark, dir, rows(100, 102))
    val (lines, _) = rewriteLines(dir, sources, 0, 4)
    val landed = TxTable.publishReadDependent(spark, dir, readV, lines,
      TxTable.TxnProfile("compact", sources.toSet, Set.empty, allowNewRows = true))
    assert(landed == 3L, "the retry must land at the NEW tip + 1")
    // nothing lost, nothing duplicated: sources folded + append's rows
    assert(ids(TxTable.snapshot(spark, dir)) ==
      ((0L until 4L) ++ Seq(100L, 101L)))
  }

  test("a winner removing a read directory aborts the transaction") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 4))
    TxTable.append(spark, dir, rows(4, 8))
    val readV = 2L
    val sources = TxTable.liveDirs(spark, dir)
    // the winner rewrites (removes) one of this transaction's sources
    TxTable.delete(spark, dir, col("id") < 2L)
    val (lines, _) = rewriteLines(dir, sources, 0, 8)
    val e = intercept[TxTable.CommitConflict] {
      TxTable.publishReadDependent(spark, dir, readV, lines,
        TxTable.TxnProfile("compact", sources.toSet, Set.empty, allowNewRows = true))
    }
    assert(e.getMessage.contains("removed read directories"), e.getMessage)
    // the abort published nothing: the winner's delete is the tip
    assert(ids(TxTable.snapshot(spark, dir)) == (2L until 8L))
  }

  test("a winner changing metadata aborts unconditionally") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 4))
    val sources = TxTable.liveDirs(spark, dir)
    TxTable.addConstraint(spark, dir, "pos", "id >= 0")
    val (lines, _) = rewriteLines(dir, sources, 0, 4)
    val e = intercept[TxTable.CommitConflict] {
      TxTable.publishReadDependent(spark, dir, 1L, lines,
        TxTable.TxnProfile("compact", sources.toSet, Set.empty, allowNewRows = true))
    }
    assert(e.getMessage.contains("metadata"), e.getMessage)
  }

  test("allowNewRows = false (the merge/replace contract) aborts on a winner append") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 4))
    val sources = TxTable.liveDirs(spark, dir)
    TxTable.append(spark, dir, rows(100, 102)) // unseen rows
    val (lines, _) = rewriteLines(dir, sources, 0, 4)
    val e = intercept[TxTable.CommitConflict] {
      TxTable.publishReadDependent(spark, dir, 1L, lines,
        TxTable.TxnProfile("merge", sources.toSet, Set.empty, allowNewRows = false))
    }
    assert(e.getMessage.contains("added rows"), e.getMessage)
  }

  test("a winner recording deletion vectors aborts a data-reading rewrite " +
      "(the rewrite would resurrect the DV-deleted rows)") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 4))
    val sources = TxTable.liveDirs(spark, dir)
    TxTable.deleteRows(spark, dir, col("id") === 1L)
    val (lines, _) = rewriteLines(dir, sources, 0, 4)
    val e = intercept[TxTable.CommitConflict] {
      TxTable.publishReadDependent(spark, dir, 1L, lines,
        TxTable.TxnProfile("compact", sources.toSet, Set.empty, allowNewRows = true))
    }
    assert(e.getMessage.contains("deletion vectors"), e.getMessage)
  }

  test("a winner's DV COMPACTION is content-neutral and retried past") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 4))
    TxTable.deleteRows(spark, dir, col("id") === 1L)
    TxTable.deleteRows(spark, dir, col("id") === 2L)
    val readV = 3L
    val state = TxTable.liveDirs(spark, dir)
    // the transaction folds the DVs into its rewrite (scan applies them)
    val rel = s"data/${java.util.UUID.randomUUID().toString.take(12)}"
    TxTable.snapshot(spark, dir).write.parquet(s"$dir/$rel")
    // the winner: a DV compaction retires both sidecars into one
    assert(TxTable.compactDvs(spark, dir).contains(4L))
    val landed = TxTable.publishReadDependent(spark, dir, readV,
      Seq("op:compact", s"add:$rel") ++ state.map(d => s"remove:$d"),
      TxTable.TxnProfile("compact", state.toSet, Set.empty, allowNewRows = true))
    assert(landed == 5L)
    // the folded rewrite is the content; the winner's compacted sidecar
    // went inert (its pairs reference removed directories)
    assert(ids(TxTable.snapshot(spark, dir)) == Seq(0L, 3L))
  }

  test("several disjoint winners in one window all classify; the retry " +
      "lands once past the whole batch") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 4))
    val sources = TxTable.liveDirs(spark, dir)
    TxTable.append(spark, dir, rows(100, 102))
    TxTable.append(spark, dir, rows(200, 202))
    TxTable.append(spark, dir, rows(300, 302))
    val (lines, _) = rewriteLines(dir, sources, 0, 4)
    val landed = TxTable.publishReadDependent(spark, dir, 1L, lines,
      TxTable.TxnProfile("compact", sources.toSet, Set.empty, allowNewRows = true))
    assert(landed == 5L)
    assert(ids(TxTable.snapshot(spark, dir)) ==
      ((0L until 4L) ++ Seq(100L, 101L, 200L, 201L, 300L, 301L)))
  }

  // -----------------------------------------------------------------
  // Integration: real operations racing — outcomes the protocol
  // GUARANTEES (no "abort is also legal" escape hatch)
  // -----------------------------------------------------------------

  test("compactions ALWAYS land beside a blind ingest (no starvation)") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 2)) // schema settles: no schema lines later
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val unexpected = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    try {
      val tasks = (0 until 4).map { t =>
        pool.submit(new Runnable {
          def run(): Unit =
            try {
              if (t < 3) { // blind appenders
                val base = 1000L * (t + 1)
                (0 until 3).foreach(i =>
                  TxTable.append(spark, dir, rows(base + 2 * i, base + 2 * i + 2)))
              } else { // the maintenance job: must NEVER be starved out
                (0 until 3).foreach { _ =>
                  TxTable.compact(spark, dir) // Some or None, never a conflict
                }
              }
            } catch { case e: Throwable => unexpected.add(e) }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    assert(unexpected.isEmpty,
      s"a compaction or append failed beside blind appends: ${unexpected.peek()}")
    val got = ids(TxTable.snapshot(spark, dir))
    val want = ((0L until 2L) ++ (1 to 3).flatMap(t =>
      (0 until 3).flatMap(i => Seq(1000L * t + 2 * i, 1000L * t + 2 * i + 1)))).sorted
    assert(got == want, "compaction must relocate, never drop or duplicate")
  }

  test("a delete ALWAYS lands beside a blind ingest (WriteSerializable), " +
      "appended rows surviving as if ordered after it") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 10))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    val unexpected = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    try {
      val tasks = (0 until 3).map { t =>
        pool.submit(new Runnable {
          def run(): Unit =
            try {
              if (t < 2) { // appenders land rows OUTSIDE the delete predicate
                val base = 1000L * (t + 1)
                (0 until 3).foreach(i =>
                  TxTable.append(spark, dir, rows(base + i, base + i + 1)))
              } else { // the delete: must never be starved out by the ingest
                TxTable.delete(spark, dir, col("id") < 5L)
              }
            } catch { case e: Throwable => unexpected.add(e) }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    assert(unexpected.isEmpty, s"unexpected failure: ${unexpected.peek()}")
    val got = ids(TxTable.snapshot(spark, dir))
    val want = ((5L until 10L) ++
      (1 to 2).flatMap(t => (0 until 3).map(i => 1000L * t + i))).sorted
    assert(got == want,
      "delete must remove exactly the read snapshot's matches and lose no append")
  }

  test("delete(serializable = true) opts into full Serializable: the " +
      "primitive aborts on a winner append under allowNewRows = false") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 6))
    // stage the write-skew interleaving deterministically: a blind
    // append lands between the serializable delete's read and publish
    val readV = 1L
    val sources = TxTable.liveDirs(spark, dir)
    TxTable.append(spark, dir, rows(100, 102))
    val (lines, _) = rewriteLines(dir, sources, 5, 6)
    intercept[TxTable.CommitConflict] {
      TxTable.publishReadDependent(spark, dir, readV, lines,
        TxTable.TxnProfile("delete", sources.toSet, Set.empty,
          allowNewRows = false))
    }
    // and the end-to-end knob on a quiet table still commits normally
    assert(TxTable.delete(spark, dir, col("id") < 2L, serializable = true) == 3L)
    assert(ids(TxTable.snapshot(spark, dir)) ==
      ((2L until 6L) ++ Seq(100L, 101L)))
  }

  test("overwrite RE-DERIVES on a race: a manually claimed version just " +
      "moves it to the next number, removes covering the interleaving") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 4))
    // a racer claims version 2 out from under the overwrite with an add
    // the overwrite's retry must now also remove
    val rel = s"data/${java.util.UUID.randomUUID().toString.take(12)}"
    rows(50, 52).write.parquet(s"$dir/$rel")
    val log = java.nio.file.Paths.get(dir, "_log")
    java.nio.file.Files.write(log.resolve("0" * 19 + "2"),
      s"op:append\nadd:$rel\n".getBytes("UTF-8"))
    val v = TxTable.overwrite(spark, dir, rows(700, 703))
    assert(v == 3L, "the overwrite re-derives and lands on the next version")
    assert(ids(TxTable.snapshot(spark, dir)) == (700L until 703L),
      "overwrite replaces the table wholesale, interleavings included")
    assert(liveSet(dir).size == 1)
  }
}
