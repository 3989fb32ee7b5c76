package graft.sources

import graft.SparkTestBase

/** The protocol FEATURE GATE (the Delta reader/writer-feature shape,
  * Armbrust et al. VLDB'20 §3): a feature-free table requires only
  * protocol 1 and stays readable by pre-feature engines; the commit
  * that first declares a v2 action — a generated/identity column, a
  * group's tracked member schema — stamps `protocol:2`, so a
  * protocol-1 reader FAILS INFORMATIVELY instead of appending without
  * assigning identity values / validating generated columns (silent
  * write-contract corruption) or crashing raw on a `schema:<table>:`
  * payload.
  */
class TxProtocolSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("txproto").toString

  private def logLines(dir: String, name: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(dir, "_log", name)).asScala.toSeq
  }

  private def entryName(v: Long): String = f"$v%020d"

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, i * 100L)).toDF("id", "ts")

  test("a feature-free table requires only the BASE protocol — at v1, " +
      "through appends, and in its checkpoints (older engines keep " +
      "reading it)") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 5))
    assert(logLines(dir, entryName(1L)).contains("protocol:1"))
    TxTable.append(spark, dir, rows(5, 9))
    TxTable.checkpoint(spark, dir)
    val ckpt = logLines(dir, entryName(2L) + ".ckpt")
    assert(ckpt.contains("protocol:1"), s"feature-free checkpoint: $ckpt")
    assert(TxTable.stateAt(spark, dir, 2L).protocol == 1L)
  }

  test("declaring a generated or identity column stamps protocol:2 in " +
      "THAT commit; checkpoints re-stamp the requirement so log " +
      "retention cannot lose it") {
    val dir = freshDir()
    TxTable.append(spark, dir,
      (0L until 3L).map(i => (i, i * 100L, i * 100L % 7L))
        .toDF("id", "ts", "day"))
    TxTable.addGeneratedColumn(spark, dir, "day", "ts % 7")
    assert(logLines(dir, entryName(2L)).contains("protocol:2"))
    assert(TxTable.stateAt(spark, dir, 2L).protocol == 2L)
    // the requirement survives into the checkpoint (the only seed a
    // retention-bounded reader may have); this append COMPUTES day
    TxTable.append(spark, dir, rows(3, 6))
    TxTable.checkpoint(spark, dir)
    assert(logLines(dir, entryName(3L) + ".ckpt").contains("protocol:2"))
    // identity declaration likewise
    val dir2 = freshDir()
    TxTable.addIdentityColumn(spark, dir2, "rid")
    assert(logLines(dir2, entryName(1L)).contains("protocol:2"))
    assert(!logLines(dir2, entryName(1L)).contains("protocol:1"),
      "the feature commit's own stamp replaces the v1 base stamp")
  }

  test("a group's first tracked member schema stamps protocol:2 (a " +
      "protocol-1 reader crashes raw on schema:<table>: payloads)") {
    val dir = freshDir()
    TxGroup.appendMany(spark, dir, Seq("docs" -> rows(0, 4)))
    val first = logLines(dir, entryName(1L))
    assert(first.exists(_.startsWith("schema:docs:")), s"tracked: $first")
    assert(first.contains("protocol:2"))
    // a later append whose schema is already tracked re-stamps nothing
    TxGroup.appendMany(spark, dir, Seq("docs" -> rows(4, 8)))
    assert(!logLines(dir, entryName(2L)).exists(_.startsWith("protocol:")))
    assert(TxTable.stateAt(spark, dir, 2L).protocol == 2L,
      "the replayed high-water mark carries the requirement")
  }

  test("a clone of a feature table inherits the protocol requirement; " +
      "a feature-free clone stays at base") {
    val src = freshDir(); val dst = freshDir()
    TxTable.addIdentityColumn(spark, src, "rid")
    TxTable.append(spark, src, rows(0, 5))
    TxTable.cloneTable(spark, src, dst)
    assert(logLines(dst, entryName(1L)).contains("protocol:2"))
    val src2 = freshDir(); val dst2 = freshDir()
    TxTable.append(spark, src2, rows(0, 5))
    TxTable.cloneTable(spark, src2, dst2)
    assert(logLines(dst2, entryName(1L)).contains("protocol:1"))
  }

  test("the reader guard still rejects protocols ABOVE the supported " +
      "max, from entries and from checkpoints") {
    val dir = freshDir()
    TxTable.append(spark, dir, rows(0, 3))
    TxTable.publishAt(spark, dir, 2L,
      Seq("op:upgrade", s"protocol:${TxTable.SupportedProtocol + 1}"))
    val e = intercept[IllegalStateException](TxTable.snapshot(spark, dir))
    assert(e.getMessage.contains("protocol"))
  }
}
