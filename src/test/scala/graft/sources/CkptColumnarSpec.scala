package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[CkptColumnar]] — the parquet checkpoint twin: read-path
  * equivalence with the text checkpoint (the authority), fallback on a
  * missing/corrupt twin, retention, and the measured parse-time win on
  * a many-file state that motivates the format.
  */
class CkptColumnarSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("ckptpq").toString

  private def logFiles(dir: String, suffix: String): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(java.nio.file.Paths.get(dir, "_log"))
      .iterator().asScala.filter(_.getFileName.toString.endsWith(suffix)).toSeq
  }

  /** A state exercising every checkpoint action kind: files + per-file
    * long/string stats + nulls, directory stats, a remove, a txn, a
    * tracked schema, a group table schema, a constraint, a DV sidecar.
    */
  private def stageRich(dir: String): Unit = {
    TxTable.append(spark, dir,
      (0L until 50L).map(i => (i, s"v$i")).toDF("id", "s"),
      statsCols = Seq("id", "s"))
    TxTable.append(spark, dir,
      (50L until 100L).map(i => (i, s"v$i")).toDF("id", "s"),
      statsCols = Seq("id", "s"))
    TxTable.addConstraint(spark, dir, "id_nonneg", "id >= 0")
    TxTable.deleteRows(spark, dir, col("id") === 7L) // a DV sidecar
    TxTable.delete(spark, dir, col("id") >= 90L)     // a remove
    TxGroup.appendMany(spark, dir + "_g",
      Seq("t1" -> Seq((1L, "a")).toDF("k", "v")))
    TxTable.appendTxn(spark, dir, (100L until 110L).map(i => (i, s"v$i")).toDF("id", "s"),
      "writer-a", 42L)
    ()
  }

  test("parquet seed equals text seed on a state with every action kind " +
      "(files, long/string stats, nulls, removes, txns, schemas, " +
      "constraints, colmap-free, DVs)") {
    val dir = freshDir()
    stageRich(dir)
    val tip = TxTable.tipOrZero(spark, dir)
    TxTable.checkpoint(spark, dir)
    assert(logFiles(dir, ".ckptpq").nonEmpty, "checkpoint must write the twin")
    val viaPq = TxTable.stateAt(spark, dir, tip)
    // delete every twin: the SAME read must seed from text
    logFiles(dir, ".ckptpq").foreach(java.nio.file.Files.delete(_))
    val viaText = TxTable.stateAt(spark, dir, tip)
    assert(viaPq == viaText,
      "the columnar seed must reconstruct the EXACT state the text " +
        "checkpoint replays")
    // and the group's per-table schema rides the twin too
    TxTable.checkpoint(spark, dir + "_g")
    val gTip = TxTable.tipOrZero(spark, dir + "_g")
    val gPq = TxTable.stateAt(spark, dir + "_g", gTip)
    logFiles(dir + "_g", ".ckptpq").foreach(java.nio.file.Files.delete(_))
    assert(gPq == TxTable.stateAt(spark, dir + "_g", gTip))
    assert(gPq.tableSchemas.keySet == Set("t1"))
  }

  test("a corrupt twin falls back to the text checkpoint (never a " +
      "half-seeded replay)") {
    val dir = freshDir()
    stageRich(dir)
    val tip = TxTable.tipOrZero(spark, dir)
    TxTable.checkpoint(spark, dir)
    val want = TxTable.stateAt(spark, dir, tip)
    logFiles(dir, ".ckptpq").foreach { p =>
      java.nio.file.Files.write(p, "not parquet".getBytes)
    }
    assert(TxTable.stateAt(spark, dir, tip) == want)
  }

  test("cleanupLog reclaims twins with their checkpoints") {
    val dir = freshDir()
    (0 until 18).foreach { i =>
      TxTable.append(spark, dir, Seq((i.toLong, "x")).toDF("id", "s"))
    }
    // two auto-checkpoints (8, 16) exist; retainMs=0 reclaims the prefix
    assert(logFiles(dir, ".ckptpq").size >= 2)
    TxTable.cleanupLog(spark, dir, retainMs = 0L)
    val leftPq = logFiles(dir, ".ckptpq").map(_.getFileName.toString)
    assert(leftPq == Seq("00000000000000000016.ckptpq"),
      s"twins below the boundary must age out with their versions: $leftPq")
  }

  test("MEASURED: the columnar seed beats the text parse on a many-file " +
      "state (the 10^5-file cold-read motivation)") {
    val dir = freshDir()
    TxTable.append(spark, dir, Seq((1L, "x")).toDF("id", "s"))
    // one commit carrying a fabricated 60k-file directory with per-file
    // long stats — the shape a large staged corpus's log converges to
    // (stateAt never lists or opens data files, so fabricated records
    // replay exactly like real ones)
    // realistic shapes: uuid-length part names, 24-char string bounds —
    // what statsLines records on a real corpus (the text side pays
    // base64 over every string bound; the twin stores them plain)
    val n = 60000
    def hex(i: Int, salt: Int): String =
      f"${i * 2654435761L + salt}%016x${i * 40503L + salt * 7L}%016x"
    val fileLines = (0 until n).flatMap { i =>
      val f = f"part-${i % 200}%05d-${hex(i, 1)}.c000.snappy.parquet"
      Seq(s"file:data/huge:$f:1048576:1700000000000:1000",
        s"fstats:data/huge:$f:id:${i * 1000}:${i * 1000 + 999}:0",
        s"fsstats:data/huge:$f:s:${TxTable.b64e("doc-" + hex(i, 2).take(20))}:${TxTable.b64e("doc-" + hex(i, 3).take(20))}:0")
    }
    TxTable.publishAt(spark, dir, 2L, Seq("op:append", "add:data/huge") ++ fileLines)
    TxTable.checkpoint(spark, dir)
    val tip = 2L
    def time(body: => TxTable.TableState): (Double, TxTable.TableState) = {
      val t0 = System.nanoTime()
      val st = body
      ((System.nanoTime() - t0) / 1e6, st)
    }
    // warm both paths once (JIT, page cache), then best-of-3 each
    val pqPath = logFiles(dir, ".ckptpq")
    assert(pqPath.nonEmpty)
    val viaPqWarm = TxTable.stateAt(spark, dir, tip)
    val pqTimes = (1 to 5).map(_ => time(TxTable.stateAt(spark, dir, tip)))
    val bytesPq = java.nio.file.Files.size(pqPath.head)
    val moved = pqPath.map { p =>
      val bak = p.resolveSibling(p.getFileName.toString + ".bak")
      java.nio.file.Files.move(p, bak); bak
    }
    val viaTextWarm = TxTable.stateAt(spark, dir, tip)
    val textTimes = (1 to 5).map(_ => time(TxTable.stateAt(spark, dir, tip)))
    moved.foreach { b =>
      java.nio.file.Files.move(b,
        b.resolveSibling(b.getFileName.toString.stripSuffix(".bak")))
    }
    assert(viaPqWarm == viaTextWarm, "equivalence before any timing claim")
    val pqBest = pqTimes.map(_._1).min
    val textBest = textTimes.map(_._1).min
    val bytesText = java.nio.file.Files.size(
      logFiles(dir, ".ckpt").head)
    info(f"columnar seed: $pqBest%.1f ms ($bytesPq%,d B) vs text parse: " +
      f"$textBest%.1f ms ($bytesText%,d B) at $n files x 3 stat lines")
    assert(pqBest < textBest,
      f"the twin must beat the text parse at $n files: $pqBest%.1f ms vs " +
        f"$textBest%.1f ms")
  }
}
