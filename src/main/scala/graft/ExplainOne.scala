package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: print a structural summary of a named query's optimized plan. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sfDir = args(1)
    val spark = SessionDefaults(SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // deterministic extension install: every query sees the same
    // registry + optimizer rules regardless of its position in the run
    GraftExtensions.registerAll(spark)
    val df = SparkEntry.queries(name)(spark, sfDir)
    // executedPlan, not sparkPlan: exchanges are inserted by the physical
    // preparation rules (EnsureRequirements), which sparkPlan predates —
    // counting on sparkPlan reports 0 shuffles for every query
    val phys = df.queryExecution.executedPlan.toString
    // NOTE: InMemoryRelation renders its CACHED child plan inline, so raw
    // "Scan parquet" line counts over-report real scans when kernels are
    // pinned — read them together with the cached-scan count
    println("=== scans: " + phys.linesIterator.count(_.contains("Scan parquet")))
    println("=== cached scans (InMemoryTableScan): " +
      phys.linesIterator.count(_.contains("InMemoryTableScan")))
    // tree lines carry "+- "/":- " branch prefixes, so match the node name
    // anywhere in the line, splitting shuffles from broadcasts by kind
    println("=== shuffle exchanges: " + phys.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") || l.contains("Exchange rangepartitioning") ||
        l.contains("Exchange SinglePartition") || l.contains("Exchange RoundRobinPartitioning")))
    println("=== broadcasts: " + phys.linesIterator.count(_.contains("BroadcastExchange")))
    phys.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Scan parquet") || l.contains("InMemoryTableScan"))
      .foreach(l => println(l.take(150)))
    spark.stop()
  }
}
