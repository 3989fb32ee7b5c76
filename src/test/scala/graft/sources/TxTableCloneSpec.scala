package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** SHALLOW CLONE ([[TxTable.cloneTable]] — Delta's CLONE TABLE): a
  * zero-copy metadata commit referencing the source's files by absolute
  * path; independent evolution afterwards; compact materializes.
  */
class TxTableCloneSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("txclone").toString

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, i * 10)).toDF("id", "v")

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).sorted.toSeq

  private def dataFiles(dir: String): Set[String] = {
    val root = java.nio.file.Paths.get(dir, "data")
    if (!java.nio.file.Files.exists(root)) return Set.empty
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p))
      .map(_.toString).toSet
  }

  test("a clone is ZERO-COPY: no data directory exists under the " +
      "destination, yet it reads the source's content") {
    val src = freshDir(); val dst = freshDir()
    TxTable.append(spark, src, rows(0, 5), statsCols = Seq("id"))
    TxTable.append(spark, src, rows(5, 10), statsCols = Seq("id"))
    assert(TxTable.cloneTable(spark, src, dst) == 1L)
    assert(dataFiles(dst).isEmpty, "shallow clone must copy no data")
    assert(ids(TxTable.snapshot(spark, dst)) == (0L until 10L))
    // stats carried: the pruned read's footprint stays one directory
    val pruned = TxTable.snapshotWhere(spark, dst,
      Seq(TxTable.LongRange("id", 0L, 4L)))
    assert(ids(pruned.filter(col("id") <= 4L)) == (0L until 5L))
    assert(pruned.inputFiles.length < TxTable.snapshot(spark, dst).inputFiles.length,
      "carried stats must keep pruning on the clone")
  }

  test("clone and source evolve independently; the source's files are " +
      "never modified by the clone's writes") {
    val src = freshDir(); val dst = freshDir()
    TxTable.append(spark, src, rows(0, 6), statsCols = Seq("id"))
    TxTable.cloneTable(spark, src, dst)
    val srcFilesBefore = dataFiles(src)
    // the clone deletes and appends; the source appends its own rows
    TxTable.delete(spark, dst, col("id") < 2L)
    TxTable.append(spark, dst, rows(100, 103))
    TxTable.append(spark, src, rows(200, 202))
    assert(ids(TxTable.snapshot(spark, dst)) ==
      ((2L until 6L) ++ (100L until 103L)))
    assert(ids(TxTable.snapshot(spark, src)) ==
      ((0L until 6L) ++ (200L until 202L)))
    assert(dataFiles(src) -- srcFilesBefore ==
      dataFiles(src).filter(_ => false) ++ (dataFiles(src) -- srcFilesBefore),
      "sanity")
    // the source's ORIGINAL files are byte-identical (never rewritten)
    assert(srcFilesBefore.subsetOf(dataFiles(src)),
      "the clone's delete must rewrite into its OWN root, not the source's")
  }

  test("deletion vectors carry into the clone and compose with its own") {
    val src = freshDir(); val dst = freshDir()
    TxTable.append(spark, src, rows(0, 8))
    TxTable.deleteRows(spark, src, col("id") === 3L)
    TxTable.cloneTable(spark, src, dst)
    assert(ids(TxTable.snapshot(spark, dst)) ==
      Seq(0L, 1L, 2L, 4L, 5L, 6L, 7L))
    // the clone's own DV delete stacks on the carried one
    TxTable.deleteRows(spark, dst, col("id") === 5L)
    assert(ids(TxTable.snapshot(spark, dst)) == Seq(0L, 1L, 2L, 4L, 6L, 7L))
    // the source never saw the clone's delete
    assert(ids(TxTable.snapshot(spark, src)) ==
      Seq(0L, 1L, 2L, 4L, 5L, 6L, 7L))
  }

  test("compactDvs folds a clone's carried (absolute-path) sidecars — " +
      "the r16 advice's $dir/$f resolution bug") {
    val src = freshDir(); val dst = freshDir()
    TxTable.append(spark, src, rows(0, 10))
    // TWO outstanding DVs on the source, both carried as absolute refs
    TxTable.deleteRows(spark, src, col("id") === 1L)
    TxTable.deleteRows(spark, src, col("id") === 2L)
    TxTable.cloneTable(spark, src, dst)
    assert(TxTable.deletionVectors(spark, dst).size == 2)
    assert(TxTable.deletionVectors(spark, dst).forall(_.startsWith("/")),
      "carried sidecars are absolute references into the source's root")
    // the fold must READ both carried sidecars (dataPath resolution, not
    // naive $dir/$f concatenation) and land one clone-LOCAL sidecar
    assert(TxTable.compactDvs(spark, dst).isDefined)
    val folded = TxTable.deletionVectors(spark, dst)
    assert(folded.size == 1 && folded.forall(!_.startsWith("/")),
      s"the folded sidecar must live under the clone's own root: $folded")
    assert(ids(TxTable.snapshot(spark, dst)) ==
      Seq(0L, 3L, 4L, 5L, 6L, 7L, 8L, 9L))
    // maintain (which folds best-effort) keeps working on the clone too
    TxTable.deleteRows(spark, dst, col("id") === 4L)
    TxTable.maintain(spark, dst)
    assert(ids(TxTable.snapshot(spark, dst)) ==
      Seq(0L, 3L, 5L, 6L, 7L, 8L, 9L))
  }

  test("compact MATERIALIZES a clone: afterwards no source references " +
      "remain and the clone survives source vacuum") {
    val src = freshDir(); val dst = freshDir()
    TxTable.append(spark, src, rows(0, 4))
    TxTable.append(spark, src, rows(4, 8))
    TxTable.cloneTable(spark, src, dst)
    TxTable.compact(spark, dst)
    assert(TxTable.liveDirs(spark, dst).forall(d => !d.startsWith("/")),
      "a materialized clone references only its own root")
    // simulate the source's files going away entirely
    TxTable.overwrite(spark, src, rows(999, 1000))
    TxTable.vacuum(spark, src, horizonMs = -1L)
    assert(ids(TxTable.snapshot(spark, dst)) == (0L until 8L))
  }

  test("cloning a historical version is cheap time travel; schema and " +
      "constraints carry; the txn ledger does not") {
    val src = freshDir(); val dst = freshDir()
    TxTable.appendTxn(spark, src, rows(0, 4), writerId = "w", txnId = 7L)
    TxTable.addConstraint(spark, src, "pos", "id >= 0")
    TxTable.append(spark, src, rows(4, 8))
    TxTable.cloneTable(spark, src, dst, version = Some(2L))
    assert(ids(TxTable.snapshot(spark, dst)) == (0L until 4L))
    // the constraint gates the clone's writes
    intercept[IllegalArgumentException] {
      TxTable.append(spark, dst, Seq((-5L, 0L)).toDF("id", "v"))
    }
    // a fresh writer ledger: the source's txn 7 does not block the clone
    assert(TxTable.lastTxn(spark, dst, "w").isEmpty)
    assert(TxTable.appendTxn(spark, dst, rows(50, 52), "w", 1L).nonEmpty)
  }

  test("clone guards: committed destination, relative source") {
    val src = freshDir(); val dst = freshDir()
    TxTable.append(spark, src, rows(0, 2))
    TxTable.append(spark, dst, rows(0, 1))
    intercept[IllegalArgumentException] {
      TxTable.cloneTable(spark, src, dst)
    }
    intercept[IllegalArgumentException] {
      TxTable.cloneTable(spark, "relative/path", freshDir())
    }
  }
}
