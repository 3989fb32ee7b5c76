package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: one plan-shape line per declared BATCH query — exchange /
  * broadcast / join-strategy / scan counts and codegen span count, the §1
  * audit record (plans/<round>/PLAN_AUDIT.txt). Streaming-drain queries
  * are skipped: building their frame RUNS the drain, and their plan story
  * is the checkpoint's state-partitioning metadata (see the per-query
  * before/after files), not the readout plan. args: sfDir outFile
  */
object PlanAudit {

  /** Queries whose construction starts (and awaits) a stream drain or a
    * multi-batch ingest — [[Bench.streamingIds]] (the one authoritative
    * set, so the two lists cannot drift as rounds add streaming queries)
    * plus the staged-ingest additions the bench times as batch queries;
    * their readout plans are trivial read-backs.
    */
  private def isDrain(name: String): Boolean =
    (Bench.streamingIds ++ Set("q241", "q242")).contains(name.takeWhile(_ != '_'))

  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outFile = args(1)
    val spark = SessionDefaults(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.registerAll(spark)
    val sb = new StringBuilder
    sb.append("# plan-shape audit: exchanges/broadcasts/joins/scans/codegen spans per batch query\n")
    sb.append(s"# sfDir=$sfDir; streaming drains skipped (plan story = checkpoint metadata)\n")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (isDrain(name)) sb.append(f"$name%-42s DRAIN (skipped)\n")
      else {
        try graft.operators.CacheScope.scoped {
          val df = fn(spark, sfDir)
          val phys = df.queryExecution.executedPlan.toString
          val lines = phys.linesIterator.toSeq
          def c(p: String) = lines.count(_.contains(p))
          val shuffles = c("Exchange hashpartitioning") + c("Exchange rangepartitioning") +
            c("Exchange SinglePartition") + c("Exchange RoundRobinPartitioning")
          val joins = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
            "BroadcastNestedLoopJoin", "CartesianProduct")
            .map(j => j -> c(j)).filter(_._2 > 0)
            .map { case (j, n) => s"$j:$n" }.mkString(",")
          val codegen = lines.count(_.contains("WholeStageCodegen"))
          val pushed = lines.count(l =>
            l.contains("PushedFilters: [") && !l.contains("PushedFilters: []"))
          sb.append(f"$name%-42s shuffles=$shuffles%-3d bcast=${c("BroadcastExchange")}%-3d " +
            f"scans=${c("Scan parquet")}%-3d cached=${c("InMemoryTableScan")}%-3d " +
            f"codegen=$codegen%-3d pushedScans=$pushed%-3d joins=[$joins]\n")
        } catch { case scala.util.control.NonFatal(e) =>
          sb.append(f"$name%-42s ERROR ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(80)}\n")
        }
      }
    }
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(outFile).getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), sb.toString)
    println(s"[planaudit] -> $outFile")
    spark.stop()
  }
}
