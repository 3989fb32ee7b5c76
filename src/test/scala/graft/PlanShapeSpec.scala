package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan-shape contracts over the REAL testdata — the physical properties
  * the 100 TB design depends on, pinned as regression tests:
  *
  *   - column pruning reaches the parquet scan (projections never read
  *     the full schema);
  *   - filters are pushed into the scan (PushedFilters non-empty);
  *   - fixed-cardinality dims join via broadcast, and the fact side of
  *     q01 never shuffles before aggregation;
  *   - the LSH bucket joins are HASH joins — a stats regression that
  *     degenerates them to CartesianProduct (round-2's ScaleOut bug)
  *     fails here, not in a 6-minute bench.
  */
class PlanShapeSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"
  private def haveTestdata = new java.io.File(s"$sfDir/lineitem.parquet").exists()

  /** Fully-planned (post-AQE if triggered) physical plan string. */
  private def plan(df: DataFrame): String = {
    df.write.format("noop").mode("overwrite").save()
    val root = df.queryExecution.executedPlan
    val s = root.collectFirst { case a: AdaptiveSparkPlanExec => a.executedPlan.toString }
      .getOrElse(root.toString)
    spark.catalog.clearCache()
    s
  }

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sfDir)

  test("q02 projection prunes the lineitem scan to the selected columns") {
    assume(haveTestdata)
    val scanLine = plan(q("q02_projection")).linesIterator
      .find(_.contains("FileScan parquet")).get
    // 4 projected columns and nothing more in the scan's output schema
    assert(scanLine.contains("l_orderkey"))
    assert(!scanLine.contains("l_comment") && !scanLine.contains("l_shipdate"),
      s"scan not pruned: $scanLine")
  }

  test("q03 filter is pushed down into the scan") {
    assume(haveTestdata)
    val p = plan(q("q03_filter"))
    assert(p.contains("PushedFilters: [IsNotNull"), "expected non-empty PushedFilters")
  }

  test("q01 joins fixed-cardinality dims via broadcast, no fact-side pre-agg shuffle") {
    assume(haveTestdata)
    val p = plan(q("q01_revenue_by_nation"))
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast")
    assert(!p.contains("SortMergeJoin"), s"unexpected sort-merge join in q01")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("LSH bucket joins are hash joins, never cartesian (stats regression guard)") {
    assume(haveTestdata)
    Seq("q25_dedup_embedding_lsh", "q27_ann_topk_lsh").foreach { name =>
      val p = plan(q(name))
      assert(!p.contains("CartesianProduct"),
        s"$name degenerated to CartesianProduct — input stats lost")
      assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
        p.contains("ShuffledHashJoin"), s"$name: no hash join found")
    }
  }

  test("q37 batch sessionization shuffles once by user_id") {
    assume(haveTestdata)
    val p = plan(q("q37_events_sessionize"))
    // one hash exchange for the user_id window+agg chain; the only other
    // exchange is the final presentation-order range partitioning
    val exchanges = p.linesIterator.filter(_.contains("Exchange ")).toSeq
    val hashExchanges = exchanges
      .filter(l => l.contains("Exchange hashpartitioning") && !l.contains("Reused"))
    assert(hashExchanges.size == 1,
      s"expected exactly one hash exchange, got:\n${exchanges.mkString("\n")}")
    assert(hashExchanges.head.contains("user_id"))
  }
}
