package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Or}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.{ByteType, DataType, DateType, IntegerType, LongType, ShortType, StringType, StructType}

import graft.sources.TxTable.{FileRec, LongRange, Stat, StatsPred, StrRange, StrStat}

/** CATALYST-INTEGRATED stats pruning for [[TxTable]] — the Delta
  * architecture (TahoeFileIndex): the table's snapshot surfaces as a
  * Spark V1 file relation whose [[FileIndex]] receives the query's own
  * PUSHED-DOWN data filters at planning time and answers with only the
  * stats-overlapping FILES. A user writes a plain
  * `.filter($"doc_id" === k)` — or any conjunction Catalyst can push —
  * and files disappear from the scan BEFORE any task launches, with no
  * opt-in predicate language: [[TxTable.snapshotWhere]] remains the
  * explicit form, this is the same pruning engaged through Catalyst's
  * own pushdown. Filters this index cannot interpret simply prune
  * nothing (the scan stays a superset and Spark re-applies every filter
  * row-wise — pruning is an optimization, never a correctness input,
  * exactly the [[TxTable]] stats contract).
  *
  * FILE granularity, LOG-BACKED listing (the Delta add-action shape):
  * the log records each added directory's file names / lengths / mtimes
  * ([[TxTable.FileRec]]) plus per-file min/max and null counts, so the
  * index FABRICATES its [[FileStatus]] listing from the log — the plan
  * path performs ZERO filesystem listings for directories the log
  * describes (at 10^5 live directories that is 10^5 sequential driver
  * RPCs saved per query), and pruning decides file by file where
  * directory stats decide all-or-nothing. Directories written before
  * file tracking (or with incomplete records) fall back to one listing
  * each, counted in [[fallbackListings]] so the zero-listing contract
  * is spec-pinned; their files prune at directory granularity through
  * the recorded directory stats.
  *
  * Altitude note: [[FileIndex]] / `HadoopFsRelation` are Spark's
  * `execution.datasources` internals — the same seam Delta's OSS
  * implementation builds its log-backed index on (TahoeLogFileIndex);
  * the engine touches nothing below this seam (the scan itself is the
  * stock `ParquetFileFormat` with its vectorized reader, codegen, and
  * `_metadata` support — which is what lets the deletion-vector
  * anti-join ride on top unchanged).
  *
  * Scale shape: construction is pure driver-side assembly from the
  * already-reconstructed log state (plus the legacy per-directory
  * fallback listings, none on a current-format table); `listFiles` is
  * pure driver-side set arithmetic over recorded stats (no I/O, no
  * jobs); [[sizeInBytes]] reports the full live sum — deliberately
  * (see its doc: stats are computed before this query's listFiles, and
  * under-sizing risks a wrong auto-broadcast; kept bytes stay
  * observable as [[lastKeptBytes]]).
  */
final class TxFileIndex(
    spark: SparkSession,
    dir: String,
    live: Seq[String],
    stats: Map[String, Map[String, Stat]],
    fileRecs: Map[String, Seq[FileRec]],
    dataSchema: StructType) extends FileIndex {

  /** Legacy-directory listings this index performed at construction —
    * 0 for a table whose log records every live file (the zero-
    * filesystem-listing plan path, spec-pinned).
    */
  @volatile var fallbackListings: Int = 0

  // one FileStatus per live data file: FABRICATED from the log's file
  // records when present (zero filesystem calls), listed once per
  // legacy directory otherwise — snapshot-pinned either way, like every
  // TxTable read (refresh() is deliberately a no-op). recOf keys per-file
  // stats lookups in listFiles; legacy files have no entry there.
  private val filesByDir: Seq[(String, Array[(FileStatus, Option[FileRec])])] = {
    val conf = spark.sessionState.newHadoopConf()
    live.map { d =>
      val p = new Path(TxTable.dataPath(dir, d))
      val recs = fileRecs.getOrElse(d, Nil)
      if (recs.nonEmpty && recs.forall(_.len >= 0)) {
        // makeQualified is driver-local string work (no RPC): fabricated
        // paths resolve like listed ones on any default filesystem
        val fs = p.getFileSystem(conf)
        val blockSize = fs.getDefaultBlockSize(p)
        d -> recs.toArray.map { r =>
          val st = new FileStatus(r.len, false, 1, blockSize, r.mtime,
            fs.makeQualified(new Path(p, r.name)))
          (st, Some(r): Option[FileRec])
        }
      } else {
        fallbackListings += 1
        val fs = p.getFileSystem(conf)
        d -> fs.listStatus(p)
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          .map(st => (st, None: Option[FileRec]))
      }
    }
  }

  override def rootPaths: Seq[Path] =
    live.map(d => new Path(TxTable.dataPath(dir, d)))

  override def partitionSchema: StructType = StructType(Nil)

  // ------------------------------------------------------------------
  // Pushed-filter translation
  // ------------------------------------------------------------------

  import TxFileIndex.{AnyOf, IdxPred, IsNullP, NotNullP, RangeP, StrFloorP}

  /** Translate one pushed-down conjunct into the index predicate
    * language, when its shape allows: comparisons between a column of a
    * stats-capable type and a literal, null tests, and AND/OR
    * combinations of those. Anything else contributes nothing (prunes
    * nothing — safe).
    */
  private def predOf(e: Expression): Seq[IdxPred] = {
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
      // OR as range union: a file is kept as soon as EITHER side's
      // conjunction admits it. A side that translates to NOTHING admits
      // every file, so the whole OR prunes nothing then.
      case Or(l, r) =>
        val lp = predOf(l)
        val rp = predOf(r)
        if (lp.nonEmpty && rp.nonEmpty) Seq(AnyOf(Seq(lp, rp))) else Nil
      case IsNotNull(a: AttributeReference) => Seq(NotNullP(a.name))
      case IsNull(a: AttributeReference) => Seq(IsNullP(a.name))
      case EqualTo(a: AttributeReference, Literal(v, t)) if v != null =>
        if (longTyped(t)) Seq(RangeP(LongRange(a.name, longOf(v), longOf(v))))
        else if (t == StringType)
          Seq(RangeP(StrRange(a.name, v.toString, v.toString)))
        else Nil
      case EqualTo(Literal(v, t), a: AttributeReference) if v != null =>
        predOf(EqualTo(a, Literal(v, t)))
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, t)) if v != null =>
        if (longTyped(t)) Seq(RangeP(LongRange(a.name, longOf(v), Long.MaxValue)))
        else if (t == StringType) Seq(StrFloorP(a.name, v.toString, strict = false))
        else Nil
      case GreaterThan(a: AttributeReference, Literal(v, t)) if v != null =>
        if (longTyped(t))
          // v = MaxValue would overflow to an empty-but-wrapped range;
          // nothing is > MaxValue, so the degenerate bound is safe as-is
          Seq(RangeP(LongRange(a.name,
            if (v == Long.MaxValue) Long.MaxValue else longOf(v) + 1, Long.MaxValue)))
        else if (t == StringType) Seq(StrFloorP(a.name, v.toString, strict = true))
        else Nil
      case LessThanOrEqual(a: AttributeReference, Literal(v, t)) if v != null =>
        if (longTyped(t)) Seq(RangeP(LongRange(a.name, Long.MinValue, longOf(v))))
        else if (t == StringType)
          // "" is a true floor in UTF-8 byte order
          Seq(RangeP(StrRange(a.name, "", v.toString)))
        else Nil
      case LessThan(a: AttributeReference, Literal(v, t)) if v != null =>
        if (longTyped(t))
          Seq(RangeP(LongRange(a.name, Long.MinValue,
            if (v == Long.MinValue) Long.MinValue else longOf(v) - 1)))
        else if (t == StringType)
          // an inclusive hi is conservative for strict <
          Seq(RangeP(StrRange(a.name, "", v.toString)))
        else Nil
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
          Seq(RangeP(StrRange(a.name, lo, hi)))
        } else {
          val ls = lits.map(l => longOf(l._1))
          Seq(RangeP(LongRange(a.name, ls.min, ls.max)))
        }
      case _ => Nil
    }
  }

  // ------------------------------------------------------------------
  // Per-file admission
  // ------------------------------------------------------------------

  /** May this file contain a row satisfying `p`? Per-file stats decide
    * when recorded; the directory's stats bound legacy files; anything
    * unrecorded keeps the file (pruning is never a correctness input).
    */
  private def admits(d: String, rec: Option[FileRec], p: IdxPred): Boolean = {
    def statOf(c: String): Option[Stat] =
      rec.flatMap(_.stats.get(c))
        .orElse(stats.get(d).flatMap(_.get(c)))
    p match {
      case RangeP(sp) => TxTable.overlaps(statOf(sp.colName), sp)
      case IsNullP(c) =>
        // prunable only when the file PROVABLY holds no null: a recorded
        // null count of zero
        !rec.flatMap(_.nulls.get(c)).contains(0L)
      case NotNullP(c) =>
        // prunable only when every row is null: null count == row count
        !(rec.exists(r => r.rows >= 0 && r.nulls.get(c).contains(r.rows)))
      case StrFloorP(c, lo, strict) => statOf(c) match {
        case Some(StrStat(_, Some(hi))) =>
          val cmp = TxTable.utf8Cmp(hi, lo)
          if (strict) cmp > 0 else cmp >= 0
        case _ => true // unbounded above / unrecorded: keep
      }
      case AnyOf(alts) => alts.exists(_.forall(admits(d, rec, _)))
    }
  }

  /** The number of directories (with >= 1 kept file) and files the LAST
    * listFiles call kept — exposed so specs can pin that Catalyst's
    * pushdown actually reached the index.
    */
  @volatile var lastKeptDirs: Int = -1
  @volatile var lastKeptFiles: Int = -1
  @volatile var lastKeptBytes: Long = -1L

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val preds = dataFilters.flatMap(predOf)
    val kept = filesByDir.map { case (d, fs) =>
      d -> fs.filter { case (_, rec) => preds.forall(admits(d, rec, _)) }
    }.filter(_._2.nonEmpty)
    lastKeptDirs = kept.size
    lastKeptFiles = kept.map(_._2.length).sum
    lastKeptBytes = kept.flatMap(_._2.map(_._1.getLen)).sum
    Seq(PartitionDirectory(InternalRow.empty, kept.flatMap(_._2.map(_._1)).toArray))
  }

  override def inputFiles: Array[String] =
    filesByDir.flatMap(_._2.map(_._1.getPath.toString)).toArray

  /** The byte sum the SAME pruning [[listFiles]] would keep under these
    * filters — side-effect-free (no counters touched, no listing: pure
    * driver arithmetic over the already-assembled records). Returns the
    * full live sum when nothing translates. This is the
    * [[graft.plans.PrunedScanSizing]] seam: a per-query plan rewrite may
    * re-size the relation by ITS OWN filters, which is exactly the
    * stale-reuse hazard [[sizeInBytes]]'s conservative full sum exists
    * to avoid (see its doc).
    */
  private[graft] def keptBytesUnder(dataFilters: Seq[Expression]): Long = {
    val preds = dataFilters.flatMap(predOf)
    if (preds.isEmpty) sizeInBytes
    else filesByDir.iterator.flatMap { case (d, fs) =>
      fs.iterator.collect {
        case (st, rec) if preds.forall(admits(d, rec, _)) => st.getLen
      }
    }.sum
  }

  override def refresh(): Unit = () // snapshot-pinned by construction

  /** The byte sum the planner sizes this relation by: deliberately the
    * FULL live sum, never a past pruning decision's kept bytes. The
    * r16 advice suggested reporting the pruned size, but logical-plan
    * stats are computed BEFORE this query's own `listFiles` runs, so
    * any pruned number here would be a PREVIOUS query's — and
    * UNDER-sizing is the dangerous direction (a stale tiny kept set
    * from a selective filter would make JoinSelection auto-broadcast a
    * multi-GB table; over-sizing merely misses a broadcast). Per-query
    * pruned sizing needs a plan-rewrite seam (Delta's PrepareDeltaScan
    * shape), not a mutable override. `lastKeptBytes` stays observable
    * for specs and diagnostics.
    */
  override def sizeInBytes: Long = filesByDir.flatMap(_._2.map(_._1.getLen)).sum
}

object TxFileIndex {

  /** The index's internal predicate language — a superset of the
    * [[TxTable.StatsPred]] ranges: null-count tests (per-file only;
    * directory stats record no null counts), string LOWER bounds
    * (`>`/`>=` need an unbounded-above form [[TxTable.StrRange]] cannot
    * state — no maximal UTF-8 string exists), and disjunctions (an OR
    * keeps a file as soon as EITHER side admits it — range-union
    * pruning).
    */
  private sealed trait IdxPred
  private final case class RangeP(p: StatsPred) extends IdxPred
  private final case class IsNullP(colName: String) extends IdxPred
  private final case class NotNullP(colName: String) extends IdxPred
  private final case class StrFloorP(colName: String, lo: String,
      strict: Boolean) extends IdxPred
  private final case class AnyOf(alts: Seq[Seq[IdxPred]]) extends IdxPred

  /** [[TxTable.snapshot]] through a Catalyst-integrated file index:
    * identical rows, but ANY pushable filter over stats columns prunes
    * whole files at planning time (see class doc). Deletion vectors and
    * column mapping compose exactly as on the plain snapshot: the DV
    * anti-join rides the relation's `_metadata` columns, and the
    * logical projection re-aliases on top, so pushed filters written
    * against LOGICAL names reach the index under the PHYSICAL names its
    * stats are keyed by (Catalyst rewrites attributes through the
    * aliases as it pushes).
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
