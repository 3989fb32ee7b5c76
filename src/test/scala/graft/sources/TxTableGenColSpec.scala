package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Generated ([[TxTable.addGeneratedColumn]]) and identity
  * ([[TxTable.addIdentityColumn]]) columns — the Delta write-contract
  * features: compute-if-absent / validate-if-present, ALWAYS-assigned
  * unique increasing ids, high-water tracking through checkpoints and
  * restore, concurrent-assignment conflicts, and stats-pruning on a
  * generated column.
  */
class TxTableGenColSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("gencol").toString

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, i * 100L)).toDF("id", "ts")

  test("generated column: computed when absent, validated when provided " +
      "(mismatch rejects the whole write, nothing publishes)") {
    val dir = freshDir()
    TxTable.addGeneratedColumn(spark, dir, "bucket", "ts % 7")
    TxTable.append(spark, dir, rows(0, 10)) // absent: computed
    val snap = TxTable.snapshot(spark, dir)
    assert(snap.columns.toSeq == Seq("id", "ts", "bucket"))
    assert(snap.filter(col("bucket") =!= col("ts") % 7).count() == 0L)
    // provided and CORRECT: accepted
    TxTable.append(spark, dir,
      rows(10, 12).withColumn("bucket", col("ts") % 7))
    assert(TxTable.snapshot(spark, dir).count() == 12L)
    // provided and WRONG: the write rejects whole
    val v = TxTable.versions(spark, dir).size
    intercept[IllegalArgumentException] {
      TxTable.append(spark, dir,
        rows(12, 14).withColumn("bucket", lit(999L)))
    }
    assert(TxTable.versions(spark, dir).size == v)
    assert(TxTable.snapshot(spark, dir).count() == 12L)
  }

  test("generated column on a table WITH data: must already hold over " +
      "every existing row; violations reject the declaration") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 5).withColumn("b", col("ts") % 7))
    TxTable.addGeneratedColumn(spark, dir, "b", "ts % 7") // holds: ok
    intercept[IllegalArgumentException] {
      TxTable.addGeneratedColumn(spark, dir, "b", "ts % 5") // violated
    }
    intercept[IllegalArgumentException] {
      TxTable.addGeneratedColumn(spark, dir, "nope", "ts % 5") // absent col
    }
  }

  test("generated-column stats prune time-sliced reads (the Delta " +
      "partition-by-generated-column shape, file-granular)") {
    val dir = freshDir()
    TxTable.addGeneratedColumn(spark, dir, "day", "CAST(ts / 1000 AS BIGINT)")
    (0 until 5).foreach { d =>
      TxTable.append(spark, dir,
        (0L until 20L).map(i => (d * 20L + i, d * 1000L + i)).toDF("id", "ts"),
        statsCols = Seq("day"))
    }
    val pruned = TxTable.snapshotWhere(spark, dir,
      Seq(TxTable.LongRange("day", 2L, 2L)))
    assert(pruned.count() == 20L)
    assert(pruned.inputFiles.length <
      TxTable.snapshot(spark, dir).inputFiles.length,
      "stats on the generated column must prune the scan")
  }

  test("identity column: ALWAYS-assigned, unique, strictly increasing " +
      "across appends; providing it rejects; marks survive checkpoints") {
    val dir = freshDir()
    TxTable.addIdentityColumn(spark, dir, "rid", start = 100L, step = 10L)
    TxTable.append(spark, dir, rows(0, 7))
    val first = TxTable.snapshot(spark, dir).select("rid").as[Long].collect()
    assert(first.length == 7 && first.distinct.length == 7)
    assert(first.min == 100L, "the first batch assigns from start")
    assert(first.forall(r => (r - 100L) % 10L == 0L), "multiples of step")
    // second append: strictly above everything the first assigned
    TxTable.append(spark, dir, rows(7, 12))
    val all = TxTable.snapshot(spark, dir).select("rid").as[Long].collect()
    assert(all.length == 12 && all.distinct.length == 12)
    assert(all.sorted.drop(7).min > first.max,
      "later appends assign strictly above the mark")
    // providing the column violates GENERATED ALWAYS
    intercept[IllegalArgumentException] {
      TxTable.append(spark, dir, rows(12, 13).withColumn("rid", lit(1L)))
    }
    // cross the CheckpointEvery boundary: the mark must ride checkpoints
    (12 until 20).foreach(i => TxTable.append(spark, dir, rows(i, i + 1)))
    val deep = TxTable.snapshot(spark, dir).select("rid").as[Long].collect()
    assert(deep.length == 20 && deep.distinct.length == 20)
    // declaring identity on a table with data is rejected
    intercept[IllegalArgumentException] {
      TxTable.addIdentityColumn(spark, dir, "rid2")
    }
  }

  test("restore rolls the identity mark back with the content (freed " +
      "ids are reassignable — the Delta restore rule)") {
    val dir = freshDir()
    TxTable.addIdentityColumn(spark, dir, "rid")
    TxTable.append(spark, dir, rows(0, 3))   // v2: rids 1..
    val v2 = TxTable.tipOrZero(spark, dir)
    val markV2 = TxTable.stateAt(spark, dir, v2).idHw("rid")
    TxTable.append(spark, dir, rows(3, 6))   // v3: rids above markV2
    TxTable.restore(spark, dir, v2)
    assert(TxTable.stateAt(spark, dir, TxTable.tipOrZero(spark, dir))
      .idHw("rid") == markV2, "restore re-records the target's mark")
    TxTable.append(spark, dir, rows(3, 6))
    val all = TxTable.snapshot(spark, dir).select("rid").as[Long].collect()
    assert(all.length == 6 && all.distinct.length == 6,
      "post-restore assignment continues from the ROLLED-BACK mark " +
        "without colliding with surviving rows")
  }

  test("a clone carries generated/identity definitions and the mark; " +
      "the clone's assignments continue above the source's") {
    val src = freshDir(); val dst = freshDir()
    TxTable.addIdentityColumn(spark, src, "rid")
    TxTable.addGeneratedColumn(spark, src, "b", "ts % 7")
    TxTable.append(spark, src, rows(0, 5))
    TxTable.cloneTable(spark, src, dst)
    val srcMax = TxTable.snapshot(spark, src).agg(max("rid")).head().getLong(0)
    TxTable.append(spark, dst, rows(5, 9))
    val dstRids = TxTable.snapshot(spark, dst).select("rid").as[Long].collect()
    assert(dstRids.length == 9 && dstRids.distinct.length == 9)
    assert(dstRids.count(_ > srcMax) == 4)
    assert(TxTable.snapshot(spark, dst)
      .filter(col("b") =!= col("ts") % 7).count() == 0L)
    // the wrong-generated-value gate holds on the clone too
    intercept[IllegalArgumentException] {
      TxTable.append(spark, dst, rows(9, 10).withColumn("b", lit(42L)))
    }
  }

  test("concurrent identity appends: one commits, the other fails with " +
      "the assignment-race guidance instead of double-assigning") {
    val dir = freshDir()
    TxTable.addIdentityColumn(spark, dir, "rid")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (0 until 4).map { i =>
      new Thread(() => {
        try {
          TxTable.append(spark, dir, rows(i * 10L, i * 10L + 5L))
          results.add("ok")
        } catch {
          case e: IllegalArgumentException
              if e.getMessage.contains("identity column") =>
            results.add("raced")
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val rs = results.asScala.toSeq
    assert(rs.count(_ == "ok") >= 1, s"at least one writer commits: $rs")
    // whatever committed is unique and consistent
    val rids = TxTable.snapshot(spark, dir).select("rid").as[Long].collect()
    assert(rids.length == rids.distinct.length,
      "no interleaving may double-assign an id")
    assert(rids.length == rs.count(_ == "ok") * 5)
  }

  test("merge: identity tables reject with guidance; generated columns " +
      "must be PROVIDED by the log and are validated on write") {
    val idDir = freshDir()
    TxTable.addIdentityColumn(spark, idDir, "rid")
    TxTable.append(spark, idDir, rows(0, 3))
    val log0 = Seq((0L, 5L, 1L, "U")).toDF("id", "ts", "seq", "op")
    val e = intercept[IllegalArgumentException] {
      TxTable.merge(spark, idDir, log0, Seq("id"), Seq("seq"))
    }
    assert(e.getMessage.contains("append-path-only"))

    val gDir = freshDir()
    TxTable.addGeneratedColumn(spark, gDir, "b", "ts % 7")
    TxTable.append(spark, gDir, rows(0, 5))
    // log missing the generated column: rejected up front
    intercept[IllegalArgumentException] {
      TxTable.merge(spark, gDir, log0, Seq("id"), Seq("seq"))
    }
    // provided and wrong: rejected on the written files, nothing lands
    val v = TxTable.versions(spark, gDir).size
    intercept[IllegalArgumentException] {
      TxTable.merge(spark, gDir,
        Seq((0L, 5L, 999L, 1L, "U")).toDF("id", "ts", "b", "seq", "op"),
        Seq("id"), Seq("seq"))
    }
    assert(TxTable.versions(spark, gDir).size == v)
    // provided and right: lands
    TxTable.merge(spark, gDir,
      Seq((0L, 5L, 5L % 7L, 1L, "U")).toDF("id", "ts", "b", "seq", "op"),
      Seq("id"), Seq("seq"))
    val got = TxTable.snapshot(spark, gDir)
    assert(got.filter(col("b") =!= col("ts") % 7).count() == 0L)
    assert(got.filter(col("id") === 0L).select("ts").as[Long].head() == 5L)
  }

  test("replaceRange: computes an absent generated column like an " +
      "append; identity tables reject") {
    val dir = freshDir()
    TxTable.addGeneratedColumn(spark, dir, "b", "ts % 7")
    TxTable.append(spark, dir, rows(0, 10), statsCols = Seq("id"))
    TxTable.replaceRange(spark, dir,
      (3L until 6L).map(i => (i, i * 1000L)).toDF("id", "ts"),
      "id", 3L, 5L, statsCols = Seq("id"))
    val snap = TxTable.snapshot(spark, dir)
    assert(snap.count() == 10L)
    assert(snap.filter(col("b") =!= col("ts") % 7).count() == 0L,
      "the replacement rows carry the computed generated column")
    val idDir = freshDir()
    TxTable.addIdentityColumn(spark, idDir, "rid")
    TxTable.append(spark, idDir, rows(0, 5))
    intercept[IllegalArgumentException] {
      TxTable.replaceRange(spark, idDir, rows(1, 3), "id", 1L, 2L)
    }
  }

  test("the columnar checkpoint twin carries definitions and the mark " +
      "(parquet seed == text seed)") {
    val dir = freshDir()
    TxTable.addIdentityColumn(spark, dir, "rid")
    TxTable.addGeneratedColumn(spark, dir, "b", "ts % 7")
    TxTable.append(spark, dir, rows(0, 5))
    TxTable.checkpoint(spark, dir)
    val tip = TxTable.tipOrZero(spark, dir)
    val viaPq = TxTable.stateAt(spark, dir, tip)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(java.nio.file.Paths.get(dir, "_log"))
      .iterator().asScala
      .filter(_.getFileName.toString.endsWith(".ckptpq"))
      .foreach(java.nio.file.Files.delete(_))
    assert(viaPq == TxTable.stateAt(spark, dir, tip))
    assert(viaPq.genCols == Map("b" -> "ts % 7"))
    assert(viaPq.idCols == Map("rid" -> (1L, 1L)))
    assert(viaPq.idHw.contains("rid"))
  }

  test("identity assignment is columnar: one append's ids are DENSE " +
      "(base..base+N-1 — per-partition offsets, not sparse uid spans " +
      "that burn the Long space at scale) and NO plan in the append " +
      "scans an RDD (codegen + pruning survive the identity write)") {
    val dir = freshDir()
    TxTable.addIdentityColumn(spark, dir, "rid")
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      TxTable.append(spark, dir, rows(0, 500).repartition(7))
      // the execution listener is asynchronous — give the write's
      // callbacks a moment to land before asserting over them
      val deadline = System.currentTimeMillis() + 10000
      while (plans.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      Thread.sleep(300)
    } finally spark.listenerManager.unregister(listener)
    import scala.jdk.CollectionConverters._
    val captured = plans.asScala.toSeq
    assert(captured.nonEmpty, "the append must surface query executions")
    val rddScans = captured.filter(p =>
      p.contains("ExistingRDD") || p.contains("ExternalRDDScan"))
    assert(rddScans.isEmpty,
      s"identity append must not round-trip through an RDD scan:\n${rddScans.headOption.getOrElse("")}")
    // dense allocation: exactly start..start+N-1 in ONE append (gaps
    // exist only ACROSS appends) — the mark grows by the row count,
    // never by partition-indexed spans
    val rids = TxTable.snapshot(spark, dir).select("rid")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(rids == (1L to 500L), s"dense ids expected: ${rids.take(5)}...")
    // a second append continues above the mark, dense again
    TxTable.append(spark, dir, rows(500, 600).repartition(3))
    val rids2 = TxTable.snapshot(spark, dir).select("rid")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(rids2 == (1L to 600L), s"mark advances by row count: ${rids2.takeRight(3)}")
  }

  test("a NEGATIVE identity start assigns fine (the overflow guard is " +
      "exact arithmetic, not a division that wraps on negative bases); " +
      "a genuinely overflowing allocation still rejects before any write") {
    val dir = freshDir()
    TxTable.addIdentityColumn(spark, dir, "rid", start = -5L)
    TxTable.append(spark, dir, rows(0, 10))
    val rids = TxTable.snapshot(spark, dir).select("rid")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(rids == (-5L to 4L), s"negative-start ids: $rids")
    val dir2 = freshDir()
    TxTable.addIdentityColumn(spark, dir2, "rid", start = Long.MaxValue - 3)
    val e = intercept[IllegalArgumentException](
      TxTable.append(spark, dir2, rows(0, 10)))
    assert(e.getMessage.contains("overflow"), s"$e")
    // the declaration committed version 1; the rejected append must not
    // have added a version (a declaration-only table has no snapshot)
    assert(TxTable.tipOrZero(spark, dir2) == 1L, "nothing may publish")
  }

  test("an identity append to a frame the CALLER persisted keeps the " +
      "caller's cache: no double-pin, and release() must not evict a " +
      "cache the engine does not own") {
    val dir = freshDir()
    TxTable.addIdentityColumn(spark, dir, "rid")
    val df = rows(0, 50).repartition(4)
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    try {
      df.count() // materialize the caller's cache
      TxTable.append(spark, dir, df)
      assert(df.storageLevel ==
        org.apache.spark.storage.StorageLevel.MEMORY_ONLY,
        "the caller's cache must survive the append untouched")
      val rids = TxTable.snapshot(spark, dir).select("rid")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(rids == (1L to 50L))
    } finally df.unpersist()
  }

  test("overwrite on an identity/generated table tracks the WRITTEN " +
      "schema (assigned + computed columns included): reads surface " +
      "them and the next plain append passes the additive gate") {
    val dir = freshDir()
    TxTable.addIdentityColumn(spark, dir, "rid")
    TxTable.addGeneratedColumn(spark, dir, "day", "ts % 7")
    TxTable.append(spark, dir, rows(0, 5))
    // truncate-and-load: the incoming frame has neither rid nor day —
    // the files DO (applyWriteDefaults), and the tracked schema must
    // say so, or every later read hides them and appends fail
    TxTable.overwrite(spark, dir, rows(100, 104))
    val snap = TxTable.snapshot(spark, dir)
    assert(snap.columns.toSet == Set("id", "ts", "rid", "day"),
      s"tracked schema must include written defaults: ${snap.columns.toSeq}")
    assert(snap.count() == 4L)
    assert(snap.select("day").collect().map(_.getLong(0)).toSet ==
      (100L until 104L).map(_ * 100L % 7L).toSet)
    // identity keeps advancing across the overwrite (values never reuse)
    val overRids = snap.select("rid").collect().map(_.getLong(0)).toSet
    TxTable.append(spark, dir, rows(104, 106))
    val after = TxTable.snapshot(spark, dir)
    assert(after.count() == 6L, "plain append after overwrite must pass the gate")
    val appendRids = after.select("rid").collect().map(_.getLong(0)).toSet -- overRids
    assert(appendRids.forall(r => overRids.forall(_ < r)),
      "the overwrite's idhw mark advanced off the WRITTEN files")
  }

  test("column DDL cannot break the write contract: rename/drop of a " +
      "generated or identity column (or a column a generated expression " +
      "references) rejects; dropGeneratedColumn is the declared way out") {
    val dir = freshDir()
    TxTable.addIdentityColumn(spark, dir, "rid")
    TxTable.addGeneratedColumn(spark, dir, "day", "ts % 7")
    TxTable.append(spark, dir, rows(0, 5))
    def rejects(what: String)(body: => Any): Unit = {
      val e = intercept[IllegalArgumentException](body)
      assert(e.getMessage.contains("cannot"), s"$what: ${e.getMessage}")
    }
    rejects("rename gencol")(TxTable.renameColumn(spark, dir, "day", "dow"))
    rejects("drop gencol")(TxTable.dropColumn(spark, dir, "day"))
    rejects("rename idcol")(TxTable.renameColumn(spark, dir, "rid", "uid"))
    rejects("drop idcol")(TxTable.dropColumn(spark, dir, "rid"))
    rejects("rename referenced")(TxTable.renameColumn(spark, dir, "ts", "at"))
    rejects("drop referenced")(TxTable.dropColumn(spark, dir, "ts"))
    // shed the generated declaration: 'day' becomes a NORMAL column —
    // writes carry it like any other (no computation, no validation;
    // the 5 % 7 != value below would have been rejected under the
    // contract) and the referenced column frees up for DDL
    TxTable.dropGeneratedColumn(spark, dir, "day")
    TxTable.append(spark, dir,
      (5L until 7L).map(i => (i, i * 100L, 99L)).toDF("id", "ts", "day"))
    assert(TxTable.snapshot(spark, dir).count() == 7L)
    TxTable.renameColumn(spark, dir, "ts", "at")
    assert(TxTable.snapshot(spark, dir).columns.contains("at"))
    intercept[IllegalArgumentException](
      TxTable.dropGeneratedColumn(spark, dir, "day")) // already gone
  }
}
