package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.types.StructType

import graft.sources.TxFileIndex

/** PER-QUERY pruned sizing for [[TxFileIndex]] relations — the Delta
  * PrepareDeltaScan shape the index's own `sizeInBytes` doc names as the
  * next rung: `sizeInBytes` must stay the conservative full live sum
  * (logical-plan stats are consulted before the query's own listFiles,
  * and a mutable pruned number would leak a PREVIOUS query's kept set
  * into THIS query's join sizing — under-sizing auto-broadcasts a
  * multi-GB table), so the per-query answer is a PLAN REWRITE instead:
  * when the optimized plan holds a Filter directly over an indexed
  * relation, re-create that relation — query-locally, inside this plan
  * only — around a fixed-size wrapper reporting the byte sum the index's
  * own pruning will keep under EXACTLY those filters. JoinSelection then
  * sees the pruned size (a selective point-read flips to a broadcast
  * join), and no other query can observe the number: the wrapper lives
  * in this plan tree and nowhere else.
  *
  * Runs in the `experimental.extraOptimizations` batch — after every
  * pushdown/pruning rule has settled the Filter against the relation,
  * before physical planning reads stats. The rewrite never changes
  * answers: the wrapper delegates listing/pruning verbatim to the
  * underlying index, only `sizeInBytes` differs, and only DOWNWARD
  * (kept ⊆ live by construction; an untranslatable filter keeps the
  * full sum and the plan is left untouched). Idempotent by type: a
  * wrapped relation no longer matches the rewrite pattern.
  */
object PrunedScanSizing extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        lr @ LogicalRelation(hfs: HadoopFsRelation, _, _, _, _))
        if hfs.location.isInstanceOf[TxFileIndex] =>
      val idx = hfs.location.asInstanceOf[TxFileIndex]
      val kept = idx.keptBytesUnder(splitConjunctivePredicates(cond))
      if (kept >= idx.sizeInBytes) f
      else {
        val sized = new FixedSizeIndex(idx, kept)
        val rel = hfs.copy(location = sized)(hfs.sparkSession)
        Filter(cond, lr.copy(relation = rel))
      }
  }

  /** Delegates everything to the underlying index except the reported
    * size — the query-local stats carrier of the rewrite above.
    */
  private final class FixedSizeIndex(underlying: TxFileIndex, bytes: Long)
      extends FileIndex {
    override def rootPaths: Seq[org.apache.hadoop.fs.Path] = underlying.rootPaths
    override def partitionSchema: StructType = underlying.partitionSchema
    override def listFiles(partitionFilters: Seq[Expression],
        dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
      underlying.listFiles(partitionFilters, dataFilters)
    override def inputFiles: Array[String] = underlying.inputFiles
    override def refresh(): Unit = underlying.refresh()
    override def sizeInBytes: Long = bytes
  }

  /** Install on an existing session (idempotent) — the post-hoc twin of
    * [[graft.GraftExtensions.registerAll]]'s function registry, on the
    * `experimental.extraOptimizations` seam because optimizer rules
    * cannot be injected after session build any other way.
    */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(PrunedScanSizing))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PrunedScanSizing
  }
}
