package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.{TxFileIndex, TxTable}

/** [[PrunedScanSizing]] — per-query pruned sizing for indexed
  * transactional reads: a selective filter flips the join to broadcast
  * with the kept-byte size, and the rewrite is query-local (the exact
  * stale-reuse hazard the index's conservative `sizeInBytes` doc names
  * cannot occur).
  */
class PrunedScanSizingSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("prunesize").toString

  /** Ten decile directories with id stats — the standard staged table. */
  private def stage(dir: String): Unit =
    (0 until 10).foreach { d =>
      TxTable.append(spark, dir,
        (d * 100L until (d + 1) * 100L).map(i => (i, s"payload-$i")).toDF("id", "v"),
        statsCols = Seq("id"))
    }

  private def joinPlan(filtered: Boolean, dir: String, other: String) = {
    val left0 = TxFileIndex.snapshotIndexed(spark, dir)
    val left = if (filtered) left0.filter(col("id") === 321L) else left0
    left.join(TxFileIndex.snapshotIndexed(spark, other), Seq("id"))
  }

  test("a selective filter flips the join to broadcast through the " +
      "kept-byte size; the unfiltered plan keeps sort-merge — including " +
      "AFTER the pruned query ran (no cross-query reuse)") {
    graft.GraftExtensions.registerAll(spark)
    val dir = freshDir(); val other = freshDir()
    stage(dir); stage(other)
    val (_, idx) = TxFileIndex.relationWithIndex(spark, dir)
    val full = idx.sizeInBytes
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // between one decile file and the full table: only a pruned scan
      // may auto-broadcast (sparkPlan = the pre-AQE join selection, the
      // decision logical-plan stats drive)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (full / 2).toString)
      def isBroadcast(df: org.apache.spark.sql.DataFrame): Boolean = {
        val p = df.queryExecution.sparkPlan.toString
        p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin")
      }
      assert(!isBroadcast(joinPlan(filtered = false, dir, other)),
        "the unfiltered join must see the FULL size and stay sort-merge")
      val pruned = joinPlan(filtered = true, dir, other)
      assert(isBroadcast(pruned),
        "a point filter keeps one decile file — the rewrite must surface " +
          "the kept bytes to JoinSelection")
      // the rewrite never changes answers
      assert(pruned.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((321L, "payload-321")))
      // cross-query safety: planning the pruned query must not leak its
      // size into a LATER unfiltered plan over the same table
      assert(!isBroadcast(joinPlan(filtered = false, dir, other)),
        "the pruned size must be query-local — the stale-reuse hazard " +
          "the conservative sizeInBytes exists to avoid")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("an untranslatable filter leaves the plan untouched (full size, " +
      "no wrapper)") {
    graft.GraftExtensions.registerAll(spark)
    val dir = freshDir(); stage(dir)
    val df = TxFileIndex.snapshotIndexed(spark, dir)
      .filter(length(col("v")) > 5) // no stats language for this
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("FixedSizeIndex"))
    assert(df.count() == 1000L)
  }
}
