package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[TxFileIndex]] — Catalyst-integrated stats pruning: a PLAIN
  * `.filter(...)` over the indexed snapshot prunes whole directories at
  * planning time through Spark's own filter pushdown, with answers
  * identical to the unpruned snapshot in every composition (column
  * mapping, deletion vectors, uninterpretable filters).
  */
class TxFileIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("txidx").toString

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).sorted.toSeq

  /** Ten range-disjoint decile directories with id stats. */
  private def stageDeciles(dir: String): Unit =
    (0 until 10).foreach { i =>
      TxTable.append(spark, dir,
        (i * 100L until i * 100L + 100L).map(v => (v, v % 7)).toDF("id", "v"),
        statsCols = Seq("id"))
    }

  test("a plain .filter prunes whole directories through Catalyst pushdown") {
    val dir = freshDir()
    stageDeciles(dir)
    val (df, idx) = TxFileIndex.relationWithIndex(spark, dir)
    // equality on a point lookup, and the index kept ONE directory
    assert(ids(df.filter(col("id") === 321L)) == Seq(321L))
    assert(idx.lastKeptDirs == 1,
      s"a point filter must keep exactly the covering decile, kept ${idx.lastKeptDirs}")
    // a range touching four deciles keeps exactly four
    assert(ids(df.filter(col("id") >= 150L && col("id") < 450L)) ==
      (150L until 450L))
    assert(idx.lastKeptDirs == 4, s"kept ${idx.lastKeptDirs}")
    // no filter: full scan, all ten directories
    assert(ids(df) == (0L until 1000L))
    assert(idx.lastKeptDirs == 10)
  }

  test("uninterpretable filters prune nothing and stay correct") {
    val dir = freshDir()
    stageDeciles(dir)
    val (df, idx) = TxFileIndex.relationWithIndex(spark, dir)
    val got = ids(df.filter((col("id") % 97L) === 0L))
    assert(got == (0L until 1000L).filter(_ % 97 == 0))
    assert(idx.lastKeptDirs == 10, "an arithmetic filter must not misprune")
  }

  test("pruning composes with column mapping: filters under the LOGICAL " +
      "name reach the physical-keyed stats through alias pushdown") {
    val dir = freshDir()
    stageDeciles(dir)
    TxTable.renameColumn(spark, dir, "id", "row_id")
    val (df, idx) = TxFileIndex.relationWithIndex(spark, dir)
    val got = df.filter(col("row_id") === 555L).select("row_id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(555L))
    assert(idx.lastKeptDirs == 1,
      s"the renamed column's filter must still prune, kept ${idx.lastKeptDirs}")
  }

  test("pruning composes with deletion vectors: the anti-join rides the " +
      "pruned scan and answers stay exact") {
    val dir = freshDir()
    stageDeciles(dir)
    TxTable.deleteRows(spark, dir, col("id") % 10 === 3L)
    val (df, idx) = TxFileIndex.relationWithIndex(spark, dir)
    assert(ids(df.filter(col("id") >= 200L && col("id") <= 299L)) ==
      (200L until 300L).filterNot(_ % 10 == 3))
    assert(idx.lastKeptDirs == 1)
    // whole-table read through the DVs agrees with the plain snapshot
    assert(ids(df) == ids(TxTable.snapshot(spark, dir)))
  }

  test("string equality prunes; string > prunes nothing (no maximal " +
      "UTF-8 string exists to bound it)") {
    val dir = freshDir()
    Seq("de", "en", "fr").zipWithIndex.foreach { case (lang, i) =>
      TxTable.append(spark, dir,
        (0 until 50).map(k => (i * 50L + k, lang)).toDF("id", "lang"),
        statsCols = Seq("id", "lang"))
    }
    val (df, idx) = TxFileIndex.relationWithIndex(spark, dir)
    assert(df.filter(col("lang") === "en").count() == 50L)
    assert(idx.lastKeptDirs == 1)
    assert(df.filter(col("lang") > "en").count() == 50L) // fr only
    assert(idx.lastKeptDirs == 3, "string > must be conservative")
    assert(df.filter(col("lang") <= "de").count() == 50L)
    assert(idx.lastKeptDirs == 1)
  }

  test("IN lists prune by their covering range") {
    val dir = freshDir()
    stageDeciles(dir)
    val (df, idx) = TxFileIndex.relationWithIndex(spark, dir)
    assert(ids(df.filter(col("id").isin(210L, 215L, 290L))) ==
      Seq(210L, 215L, 290L))
    assert(idx.lastKeptDirs == 1,
      s"an IN list inside one decile must keep one directory, kept ${idx.lastKeptDirs}")
    assert(ids(df.filter(col("id").isin(110L, 720L))) == Seq(110L, 720L))
    assert(idx.lastKeptDirs == 7,
      "the covering range is conservative: [110, 720] spans seven deciles")
  }

  test("snapshotIndexed equals snapshot on an evolved (additive) table") {
    val dir = freshDir()
    TxTable.append(spark, dir, (0L until 10L).map(i => (i, i)).toDF("id", "v"),
      statsCols = Seq("id"))
    TxTable.append(spark, dir,
      (10L until 20L).map(i => (i, i, s"x$i")).toDF("id", "v", "tag"),
      statsCols = Seq("id"), allowAdditive = true)
    val idxDf = TxFileIndex.snapshotIndexed(spark, dir)
    val plain = TxTable.snapshot(spark, dir, mergeSchema = true)
    assert(idxDf.columns.sorted.toSeq == plain.columns.sorted.toSeq)
    // pre-evolution rows read the new column as null through the
    // tracked union schema — same as the mergeSchema read
    assert(idxDf.filter(col("tag").isNull).count() == 10L)
    assert(ids(idxDf) == ids(plain))
  }
}
