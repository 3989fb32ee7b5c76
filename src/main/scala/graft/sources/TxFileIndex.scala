package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{ByteType, DataType, DateType, IntegerType, LongType, ShortType, StringType, StructType}

import graft.sources.TxTable.{LongRange, Stat, StatsPred, StrRange}

/** CATALYST-INTEGRATED stats pruning for [[TxTable]] — the Delta
  * architecture (TahoeFileIndex): the table's snapshot surfaces as a
  * Spark V1 file relation whose [[FileIndex]] receives the query's own
  * PUSHED-DOWN data filters at planning time and answers with only the
  * stats-overlapping directories' files. A user writes a plain
  * `.filter($"doc_id" === k)` — or any conjunction Catalyst can push —
  * and whole directories disappear from the scan BEFORE any task
  * launches, with no opt-in predicate language: [[TxTable.snapshotWhere]]
  * remains the explicit form, this is the same pruning engaged through
  * Catalyst's own pushdown. Filters this index cannot interpret simply
  * prune nothing (the scan stays a superset and Spark re-applies every
  * filter row-wise — pruning is an optimization, never a correctness
  * input, exactly the [[TxTable]] stats contract).
  *
  * Altitude note: [[FileIndex]] / [[HadoopFsRelation]] are Spark's
  * `execution.datasources` internals — the same seam Delta's OSS
  * implementation builds its log-backed index on (TahoeLogFileIndex);
  * the engine touches nothing below this seam (the scan itself is the
  * stock [[ParquetFileFormat]] with its vectorized reader, codegen, and
  * `_metadata` support — which is what lets the deletion-vector
  * anti-join ride on top unchanged).
  *
  * Scale shape: construction lists each live directory once (driver
  * work bounded by the live-directory count — the same listing any
  * parquet multi-path read performs); `listFiles` is pure driver-side
  * set arithmetic over recorded stats (no I/O, no jobs); `sizeInBytes`
  * is the kept files' byte sum, so broadcast planning sees the PRUNED
  * size, not the table's.
  */
final class TxFileIndex(
    spark: SparkSession,
    dir: String,
    live: Seq[String],
    stats: Map[String, Map[String, Stat]],
    dataSchema: StructType) extends FileIndex {

  // one listing per live directory at construction — snapshot-pinned,
  // like every TxTable read (refresh() is deliberately a no-op)
  private val filesByDir: Seq[(String, Array[FileStatus])] = {
    val conf = spark.sessionState.newHadoopConf()
    live.map { d =>
      val p = new Path(TxTable.dataPath(dir, d))
      val fs = p.getFileSystem(conf)
      d -> fs.listStatus(p).filter(st =>
        st.isFile && st.getPath.getName.endsWith(".parquet"))
    }
  }

  override def rootPaths: Seq[Path] =
    live.map(d => new Path(TxTable.dataPath(dir, d)))

  override def partitionSchema: StructType = StructType(Nil)

  /** Translate one pushed-down conjunct into the stats predicate
    * language, when its shape allows: a comparison between a column of
    * a stats-capable type and a literal. Anything else contributes
    * nothing (prunes nothing — safe).
    */
  private def predOf(e: Expression): Seq[StatsPred] = {
    def longOf(v: Any): Long = v match {
      case i: Int => i.toLong
      case l: Long => l
      case s: Short => s.toLong
      case b: Byte => b.toLong
      case other => other.toString.toLong
    }
    def longTyped(t: DataType): Boolean = t match {
      case LongType | IntegerType | ShortType | ByteType | DateType => true
      case _ => false
    }
    (e: @unchecked) match {
      case And(l, r) => predOf(l) ++ predOf(r)
      case EqualTo(a: AttributeReference, Literal(v, t)) if v != null =>
        if (longTyped(t)) Seq(LongRange(a.name, longOf(v), longOf(v)))
        else if (t == StringType) Seq(StrRange(a.name, v.toString, v.toString))
        else Nil
      case EqualTo(Literal(v, t), a: AttributeReference) if v != null =>
        predOf(EqualTo(a, Literal(v, t)))
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, t))
          if v != null && longTyped(t) =>
        Seq(LongRange(a.name, longOf(v), Long.MaxValue))
      case GreaterThan(a: AttributeReference, Literal(v, t))
          if v != null && longTyped(t) =>
        Seq(LongRange(a.name, longOf(v) + 1, Long.MaxValue))
      case LessThanOrEqual(a: AttributeReference, Literal(v, t))
          if v != null && longTyped(t) =>
        Seq(LongRange(a.name, Long.MinValue, longOf(v)))
      case LessThan(a: AttributeReference, Literal(v, t))
          if v != null && longTyped(t) =>
        Seq(LongRange(a.name, Long.MinValue, longOf(v) - 1))
      // literal-on-left comparisons mirror
      case GreaterThanOrEqual(Literal(v, t), a: AttributeReference) =>
        predOf(LessThanOrEqual(a, Literal(v, t)))
      case GreaterThan(Literal(v, t), a: AttributeReference) =>
        predOf(LessThan(a, Literal(v, t)))
      case LessThanOrEqual(Literal(v, t), a: AttributeReference) =>
        predOf(GreaterThanOrEqual(a, Literal(v, t)))
      case LessThan(Literal(v, t), a: AttributeReference) =>
        predOf(GreaterThan(a, Literal(v, t)))
      // IN lists: a disjunction, so the conjunction-shaped predicate
      // language gets its covering range — [min, max] of the values is
      // a superset of every disjunct (exact for the common
      // consecutive-key case, conservative otherwise)
      case org.apache.spark.sql.catalyst.expressions.In(a: AttributeReference, vs)
          if vs.nonEmpty && vs.forall {
            case Literal(v, t) => v != null && (t == StringType || longTyped(t))
            case _ => false
          } =>
        val lits = vs.collect { case Literal(v, t) => (v, t) }
        if (lits.head._2 == StringType) {
          // bounds in UTF-8 byte order (the stats' order), never Java's
          // UTF-16 code units — the two diverge on supplementary planes
          val ss = lits.map(_._1.toString)
          val lo = ss.reduce((x, y) => if (TxTable.utf8Cmp(x, y) <= 0) x else y)
          val hi = ss.reduce((x, y) => if (TxTable.utf8Cmp(x, y) >= 0) x else y)
          Seq(StrRange(a.name, lo, hi))
        } else {
          val ls = lits.map(l => longOf(l._1))
          Seq(LongRange(a.name, ls.min, ls.max))
        }
      // string upper bounds: "" is a true floor in UTF-8 byte order and
      // an inclusive hi is conservative for strict <, so <=/< prune;
      // >/>= would need an "unbounded above" marker StrRange cannot
      // state (no maximal UTF-8 string exists) — they prune nothing
      case LessThanOrEqual(a: AttributeReference, Literal(v, StringType))
          if v != null =>
        Seq(StrRange(a.name, "", v.toString))
      case LessThan(a: AttributeReference, Literal(v, StringType)) if v != null =>
        Seq(StrRange(a.name, "", v.toString))
      case _ => Nil
    }
  }

  /** The number of directories the LAST listFiles call kept — exposed so
    * specs can pin that Catalyst's pushdown actually reached the index.
    */
  @volatile var lastKeptDirs: Int = -1

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val preds = dataFilters.flatMap(predOf)
    val kept = filesByDir.filter { case (d, _) =>
      preds.forall(p =>
        TxTable.overlaps(stats.get(d).flatMap(_.get(p.colName)), p))
    }
    lastKeptDirs = kept.size
    Seq(PartitionDirectory(InternalRow.empty, kept.flatMap(_._2).toArray))
  }

  override def inputFiles: Array[String] =
    filesByDir.flatMap(_._2.map(_.getPath.toString)).toArray

  override def refresh(): Unit = () // snapshot-pinned by construction

  override def sizeInBytes: Long = filesByDir.flatMap(_._2.map(_.getLen)).sum
}

object TxFileIndex {

  /** [[TxTable.snapshot]] through a Catalyst-integrated file index:
    * identical rows, but ANY pushable filter over stats columns prunes
    * whole directories at planning time (see class doc). Deletion
    * vectors and column mapping compose exactly as on the plain
    * snapshot: the DV anti-join rides the relation's `_metadata`
    * columns, and the logical projection re-aliases on top, so pushed
    * filters written against LOGICAL names reach the index under the
    * PHYSICAL names its stats are keyed by (Catalyst rewrites
    * attributes through the aliases as it pushes).
    */
  def snapshotIndexed(spark: SparkSession, dir: String,
      version: Option[Long] = None): DataFrame =
    relationWithIndex(spark, dir, version)._1

  /** [[snapshotIndexed]] plus the index itself, so tests can observe
    * the pruning decisions Catalyst's pushdown produced.
    */
  def relationWithIndex(spark: SparkSession, dir: String,
      version: Option[Long] = None): (DataFrame, TxFileIndex) = {
    val (df, idx, _) = TxTable.indexedSnapshotParts(spark, dir, version)
    (df, idx)
  }
}
