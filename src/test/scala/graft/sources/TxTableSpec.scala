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
    TxTable.append(spark, dir, Seq((2L, 20L, "x")).toDF("id", "v", "tag"))
    // default read refuses silent widening (parquet picks one schema);
    // the explicit mergeSchema read unions: old rows carry null tags
    val merged = TxTable.snapshot(spark, dir, mergeSchema = true)
      .orderBy("id").collect()
    assert(merged.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    assert(merged.take(2).forall(_.isNullAt(merged.head.fieldIndex("tag"))))
    assert(merged(2).getString(merged(2).fieldIndex("tag")) == "x")
    // compaction under the merged schema preserves the snapshot
    TxTable.compact(spark, dir)
    assert(TxTable.snapshot(spark, dir, mergeSchema = true).count() == 3)
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
