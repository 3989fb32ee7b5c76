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

  test("string equality prunes; string > prunes as an unbounded-above " +
      "floor against the recorded max") {
    val dir = freshDir()
    Seq("de", "en", "fr").zipWithIndex.foreach { case (lang, i) =>
      TxTable.append(spark, dir,
        (0 until 50).map(k => (i * 50L + k, lang)).toDF("id", "lang"),
        statsCols = Seq("id", "lang"))
    }
    val (df, idx) = TxFileIndex.relationWithIndex(spark, dir)
    assert(df.filter(col("lang") === "en").count() == 50L)
    assert(idx.lastKeptDirs == 1)
    // `lang > "en"` needs no upper bound — the recorded per-file max
    // decides: only the fr directory's max exceeds "en" (r16 verdict #2:
    // the StrRange language could not state "unbounded above"; the
    // index-internal floor predicate can)
    assert(df.filter(col("lang") > "en").count() == 50L) // fr only
    assert(idx.lastKeptDirs == 1,
      s"a string floor must prune against recorded maxes, kept ${idx.lastKeptDirs}")
    assert(df.filter(col("lang") >= "en").count() == 100L) // en + fr
    assert(idx.lastKeptDirs == 2)
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

  test("LOG-BACKED listing: the plan path performs ZERO filesystem " +
      "listings on a current-format table") {
    val dir = freshDir()
    stageDeciles(dir)
    val (df, idx) = TxFileIndex.relationWithIndex(spark, dir)
    assert(idx.fallbackListings == 0,
      s"every live file must come from the log's file records, " +
        s"listed ${idx.fallbackListings} directories")
    // the fabricated listing is complete: answers match the plain scan
    assert(ids(df) == ids(TxTable.snapshot(spark, dir)))
  }

  test("FILE-granularity pruning: a point filter keeps one file of a " +
      "multi-file directory") {
    val dir = freshDir()
    // ONE directory, four range-disjoint files (the in-directory layout
    // a range-partitioned write produces)
    TxTable.append(spark, dir,
      (0L until 1000L).map(v => (v, v % 7)).toDF("id", "v")
        .repartitionByRange(4, col("id")),
      statsCols = Seq("id"))
    val (df, idx) = TxFileIndex.relationWithIndex(spark, dir)
    assert(ids(df) == (0L until 1000L))
    assert(idx.lastKeptFiles == 4)
    assert(ids(df.filter(col("id") === 321L)) == Seq(321L))
    assert(idx.lastKeptDirs == 1)
    assert(idx.lastKeptFiles == 1,
      s"per-file stats must prune inside the directory, " +
        s"kept ${idx.lastKeptFiles} files")
  }

  test("IS NULL / IS NOT NULL prune through recorded per-file null counts") {
    val dir = freshDir()
    // two files in one directory: one all-null tag, one no-null tag
    val a = (0L until 500L).map(v => (v, Option.empty[String]))
      .toDF("id", "tag").coalesce(1)
    val b = (500L until 1000L).map(v => (v, Some(s"t$v")))
      .toDF("id", "tag").coalesce(1)
    TxTable.append(spark, dir, a.union(b), statsCols = Seq("id", "tag"))
    val (df, idx) = TxFileIndex.relationWithIndex(spark, dir)
    assert(df.filter(col("tag").isNotNull).count() == 500L)
    assert(idx.lastKeptFiles == 1,
      s"the all-null file must prune under IS NOT NULL, kept ${idx.lastKeptFiles}")
    assert(df.filter(col("tag").isNull).count() == 500L)
    assert(idx.lastKeptFiles == 1,
      s"the zero-null file must prune under IS NULL, kept ${idx.lastKeptFiles}")
    // null pruning composes with a range: IS NOT NULL AND id >= 900
    assert(df.filter(col("tag").isNotNull && col("id") >= 900L).count() == 100L)
    assert(idx.lastKeptFiles == 1)
  }

  test("OR prunes as the union of its sides' ranges; an untranslatable " +
      "side disables the OR, never miscounts") {
    val dir = freshDir()
    stageDeciles(dir)
    val (df, idx) = TxFileIndex.relationWithIndex(spark, dir)
    assert(ids(df.filter(col("id") < 100L || col("id") >= 900L)) ==
      ((0L until 100L) ++ (900L until 1000L)))
    assert(idx.lastKeptDirs == 2,
      s"an OR of two decile ranges must keep exactly those deciles, " +
        s"kept ${idx.lastKeptDirs}")
    // one side uninterpretable: the OR admits everything (safe)
    assert(ids(df.filter(col("id") < 100L || col("id") % 97L === 0L)) ==
      (0L until 1000L).filter(v => v < 100 || v % 97 == 0))
    assert(idx.lastKeptDirs == 10)
  }

  test("legacy logs without file records fall back to one listing per " +
      "directory and keep directory-granularity pruning") {
    val dir = freshDir()
    stageDeciles(dir)
    // simulate a pre-file-tracking log: strip every file-record line
    // from entries and checkpoints (the directory stats lines remain),
    // and drop the columnar twins — a legacy log predates those too
    val log = java.nio.file.Paths.get(dir, "_log")
    java.nio.file.Files.list(log).forEach { p =>
      val name = p.getFileName.toString
      if (name.endsWith(".ckptpq")) java.nio.file.Files.delete(p)
      else if (name.forall(_.isDigit) || name.endsWith(".ckpt")) {
        val kept = java.nio.file.Files.readAllLines(p).stream()
          .filter(l => !(l.startsWith("file:") || l.startsWith("fstats:") ||
            l.startsWith("fsstats:")))
          .collect(java.util.stream.Collectors.toList[String])
        java.nio.file.Files.write(p, kept)
      }
    }
    val (df, idx) = TxFileIndex.relationWithIndex(spark, dir)
    assert(idx.fallbackListings == 10,
      s"a legacy table lists each live directory once, " +
        s"listed ${idx.fallbackListings}")
    assert(ids(df.filter(col("id") === 321L)) == Seq(321L))
    assert(idx.lastKeptDirs == 1,
      "legacy directories still prune through their directory stats")
    assert(ids(df) == (0L until 1000L))
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
