package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, max, min}
import org.apache.spark.sql.types.{ByteType, DateType, IntegerType, LongType, ShortType}

/** A TRANSACTIONAL parquet table with a Delta-style ordered commit log —
  * the table-format rung above [[Segments]]' single-writer marker
  * protocol: multi-writer optimistic concurrency, snapshot-isolated
  * reads, TIME TRAVEL to any retained version, logical delete/overwrite
  * (a log entry, never an in-place file edit), MERGE (CDC upsert/delete
  * as one copy-on-write commit), log-transacted compaction, periodic
  * LOG CHECKPOINTS bounding every read's replay work, per-directory
  * column STATS with predicate-pruned scans, and a vacuum whose horizon
  * defines the time-travel retention window. The design follows the
  * published Delta Lake protocol shape (Armbrust et al., VLDB'20: an
  * ordered log of add/remove file actions; a version's snapshot = adds
  * minus removes up to it; periodic checkpoints of the reconstructed
  * state; file-level min/max stats for data skipping) re-expressed over
  * this engine's Hadoop-FS primitives; no table-format library is used.
  *
  * Layout under a table directory `dir`:
  *
  * {{{
  *   dir/_log/00000000000000000001        one file per VERSION: the
  *                                        commit, put-if-absent-published
  *   dir/_log/00000000000000000008.ckpt   CHECKPOINT: the reconstructed
  *                                        state at v8 (live set + stats +
  *                                        txn ledger) — additive, written
  *                                        every CheckpointEvery commits
  *   dir/_log/.tmp_<uuid>                 in-flight commit scratch
  *   dir/data/<uuid>/                     one parquet dir per commit's adds
  * }}}
  *
  * A log entry is lines of `op:<kind>`, `add:data/<uuid>`,
  * `remove:data/<uuid>`, `txn:<writer>:<id>`, and
  * `stats:data/<uuid>:<col>:<min>:<max>`. The snapshot at version V is
  * `union(adds in 1..V) - union(removes in 1..V)`; readers start from
  * the latest CHECKPOINT at or below V (its `live:`/`stats:`/`txn:`
  * lines are that state, precomputed) and replay only the entries after
  * it — read work is bounded by CheckpointEvery instead of growing one
  * entry per commit for the life of the table (the r13 verdict's
  * next-real-user wall). Checkpoints are ADDITIVE: no log entry is ever
  * destroyed, so time travel to pre-checkpoint versions still replays
  * exactly as before, and a racing checkpoint writer is harmless — the
  * content at a version is a pure function of the log, so the
  * put-if-absent loser discards an identical file.
  *
  * COMMIT = one atomic put-if-absent of the entry at the next
  * zero-padded version (see [[publishAt]] for the scheme-dependent
  * primitive). Two racing writers cannot both claim a version: the
  * loser re-reads the log tip and retries with the next number — its
  * DATA directory (keyed by uuid, not version) needs no rewrite, making
  * the retry a metadata-only operation. This is optimistic concurrency
  * for APPEND-shaped commits; writers whose validity depends on what
  * they read (delete/overwrite/merge/compact) abort on conflict instead
  * of retrying blindly ([[CommitConflict]]) — the caller re-reads and
  * re-derives, the serializable-writer rule of the Delta protocol.
  *
  * DELETE and MERGE are copy-on-write at directory granularity: rewrite
  * the live rows that survive (or the CDC-merged rows) into a new
  * directory, commit it as add + remove of every prior live directory.
  * Old versions stay readable (time travel) until [[vacuum]] reclaims
  * directories no LIVE-OR-RETAINED version references — after a vacuum
  * with horizon H, snapshots older than the removal are gone; that
  * trade (reclamation vs history) is the documented Delta semantics,
  * surfaced here as an explicit parameter.
  *
  * STATS & PRUNING: a writer passing `statsCols` records min/max of
  * those (integer/date-typed) columns per added directory, read back
  * from the just-written parquet (a column-pruned footer-cheap scan).
  * [[snapshotRange]] then drops live directories whose recorded range
  * cannot overlap the predicate BEFORE the parquet scan plans — the
  * IVF static-partition-filter pattern applied to the table format.
  * A directory without stats for the column is never pruned (safe
  * default), so stats are an optimization, not a correctness input.
  *
  * Scale shape: the log is driver-sized (one small file per commit,
  * replay bounded by checkpoints; the live-directory count is bounded
  * by [[compact]]). Data moves only through ordinary parquet jobs;
  * snapshot reads plan one scan over the live directories exactly like
  * a static parquet table, so every downstream operator keeps its
  * audited plan.
  */
object TxTable {

  /** Optimistic-concurrency failure for read-dependent commits. */
  final class CommitConflict(msg: String) extends RuntimeException(msg)

  private val VersionWidth = 20

  /** A checkpoint is written when the just-committed version is a
    * multiple of this — every read then replays at most this many
    * entries past the checkpoint it starts from.
    */
  private[graft] val CheckpointEvery = 8L

  private def fsFor(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def logPath(root: Path) = new Path(root, "_log")

  private def versionName(v: Long): String = {
    require(v > 0, s"versions start at 1, got $v")
    val s = v.toString
    "0" * (VersionWidth - s.length) + s
  }

  private def ckptName(v: Long): String = versionName(v) + ".ckpt"

  /** The tip version, failing with the same message as [[liveDirs]] on
    * an empty/uncommitted table (r13 advice: `versions(...).last` threw
    * a bare NoSuchElementException from the read-dependent commits).
    */
  private def tipVersion(spark: SparkSession, dir: String): Long = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"not a committed TxTable: $dir")
    vs.last
  }

  /** Committed versions, ascending; empty for a fresh/absent table. */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val (fs, root) = fsFor(spark, dir)
    val log = logPath(root)
    if (!fs.exists(log)) return Nil
    fs.listStatus(log).toSeq
      .filter(st => st.isFile && st.getPath.getName.forall(_.isDigit))
      .map(_.getPath.getName.toLong)
      .sorted
  }

  /** Checkpoint versions, ascending. */
  private def checkpointVersions(fs: FileSystem, log: Path): Seq[Long] = {
    if (!fs.exists(log)) return Nil
    fs.listStatus(log).toSeq
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && n.endsWith(".ckpt") && n.stripSuffix(".ckpt").forall(_.isDigit)
      }
      .map(_.getPath.getName.stripSuffix(".ckpt").toLong)
      .sorted
  }

  private def readLines(fs: FileSystem, p: Path): Seq[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  private def entryLines(fs: FileSystem, log: Path, v: Long): Seq[String] =
    readLines(fs, new Path(log, versionName(v)))

  /** The reconstructed table state at a version: live directories (in
    * first-add order), per-directory column stats, and the per-writer
    * txn ledger — plus the version whose checkpoint seeded the replay
    * (0 = replayed from the beginning).
    */
  private final case class TableState(
      live: Seq[String],
      stats: Map[String, Map[String, (Long, Long)]],
      txns: Map[String, Long],
      removedAt: Map[String, Long],
      replayBase: Long)

  private def stateAt(spark: SparkSession, dir: String, v: Long): TableState = {
    val (fs, root) = fsFor(spark, dir)
    val log = logPath(root)
    val base = checkpointVersions(fs, log).filter(_ <= v).lastOption.getOrElse(0L)
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    val stats = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Map[String, (Long, Long)]]
    val txns = scala.collection.mutable.Map.empty[String, Long]
    val removedAt = scala.collection.mutable.Map.empty[String, Long]
    // mtime of the log entry currently being replayed — stamps its
    // remove lines (the vacuum retention clock); checkpoints carry the
    // stamp explicitly in their removed: lines instead
    var entryMtime = 0L
    def applyLine(line: String): Unit =
      if (line.startsWith("add:")) live += line.stripPrefix("add:")
      else if (line.startsWith("live:")) live += line.stripPrefix("live:")
      else if (line.startsWith("remove:")) {
        val rel = line.stripPrefix("remove:")
        live -= rel
        stats -= rel
        removedAt(rel) = entryMtime
      } else if (line.startsWith("removed:")) {
        // checkpoint carry-forward: removed:<rel>:<removing entry mtime>
        val Array(rel, t) = line.stripPrefix("removed:").split(":", 2)
        removedAt(rel) = t.toLong
      } else if (line.startsWith("stats:")) {
        // stats:<rel>:<col>:<min>:<max> — rel and col are colon-free by
        // the writer-side requires
        line.stripPrefix("stats:").split(":", -1) match {
          case Array(rel, c, lo, hi) =>
            stats.getOrElseUpdate(rel, scala.collection.mutable.Map.empty)
              .update(c, (lo.toLong, hi.toLong))
          case other =>
            throw new IllegalStateException(s"malformed stats line: $line")
        }
      } else if (line.startsWith("txn:")) {
        val Array(w, id) = line.stripPrefix("txn:").split(":", 2)
        txns(w) = math.max(txns.getOrElse(w, Long.MinValue), id.toLong)
      }
    if (base > 0) readLines(fs, new Path(log, ckptName(base))).foreach(applyLine)
    versions(spark, dir).foreach { ver =>
      if (ver > base && ver <= v) {
        val lines = entryLines(fs, log, ver)
        if (lines.exists(_.startsWith("remove:")))
          entryMtime = fs.getFileStatus(new Path(log, versionName(ver))).getModificationTime
        lines.foreach(applyLine)
      }
    }
    TableState(live.toSeq,
      stats.view.mapValues(_.toMap).toMap, txns.toMap, removedAt.toMap, base)
  }

  /** The version whose checkpoint seeds a read at `version` (0 = full
    * replay) — exposed so the bounded-read-work contract is testable.
    */
  private[graft] def replayBase(spark: SparkSession, dir: String,
      version: Option[Long] = None): Long =
    stateAt(spark, dir, version.getOrElse(tipVersion(spark, dir))).replayBase

  /** Live data directories (relative paths) at `version` (default: the
    * log tip). Fails on an empty table or an uncommitted version.
    */
  def liveDirs(spark: SparkSession, dir: String, version: Option[Long] = None): Seq[String] = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"not a committed TxTable: $dir")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in committed range ${vs.head}..${vs.last}")
    stateAt(spark, dir, v).live
  }

  /** Per-live-directory column stats at `version` (default tip):
    * rel -> col -> (min, max). Directories whose writer recorded no
    * stats for a column are absent — and therefore never pruned.
    */
  def liveDirStats(spark: SparkSession, dir: String,
      version: Option[Long] = None): Map[String, Map[String, (Long, Long)]] = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"not a committed TxTable: $dir")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in committed range ${vs.head}..${vs.last}")
    stateAt(spark, dir, v).stats
  }

  /** Snapshot-isolated read at `version` (default: latest). The plan is
    * one parquet scan over the live directories — indistinguishable
    * from a static table to every downstream operator.
    *
    * `mergeSchema = true` supports ADDITIVE schema evolution (a later
    * append carrying new columns): the scan unions the live
    * directories' schemas and rows from pre-evolution directories read
    * the new columns as null — the Delta additive-evolution semantics.
    * Default off: schema drift in a pipeline should be an explicit
    * choice, not a silent widening.
    */
  def snapshot(spark: SparkSession, dir: String, version: Option[Long] = None,
      mergeSchema: Boolean = false): DataFrame = {
    val dirs = liveDirs(spark, dir, version)
    require(dirs.nonEmpty, "snapshot of a table whose live set is empty")
    val r = if (mergeSchema) spark.read.option("mergeSchema", "true") else spark.read
    r.parquet(dirs.map(d => s"$dir/$d"): _*)
  }

  /** Snapshot restricted to `lo <= colName <= hi`, PRUNING live
    * directories whose recorded stats cannot overlap the range before
    * the parquet scan ever plans — the data-skipping read. Directories
    * without stats for the column are kept (pruning is an optimization,
    * never a correctness input), and the residual range filter is
    * applied to the surviving scan, so the result is EXACTLY
    * `snapshot(...).filter(lo <= col && col <= hi)`.
    */
  def snapshotRange(spark: SparkSession, dir: String, colName: String,
      lo: Long, hi: Long, version: Option[Long] = None,
      mergeSchema: Boolean = false): DataFrame = {
    require(lo <= hi, s"empty range: $lo > $hi")
    val dirs = liveDirs(spark, dir, version)
    require(dirs.nonEmpty, "snapshot of a table whose live set is empty")
    val stats = liveDirStats(spark, dir, version)
    val kept = dirs.filter { d =>
      stats.get(d).flatMap(_.get(colName)) match {
        case Some((dLo, dHi)) => dHi >= lo && dLo <= hi
        case None => true
      }
    }
    val r = if (mergeSchema) spark.read.option("mergeSchema", "true") else spark.read
    if (kept.isEmpty) {
      // every directory provably out of range: an empty frame with the
      // table's schema (planning a scan over zero paths is an error)
      r.parquet(dirs.map(d => s"$dir/$d"): _*)
        .filter(org.apache.spark.sql.functions.lit(false))
    } else
      r.parquet(kept.map(d => s"$dir/$d"): _*)
        .filter(col(colName) >= lo && col(colName) <= hi)
  }

  /** One atomic PUT-IF-ABSENT of complete `tmp` content at `dst`;
    * returns whether THIS caller won. The primitive is SCHEME-DEPENDENT
    * — the same split the Delta protocol documents: on HDFS-like
    * filesystems `rename` refuses an existing destination, so rename IS
    * put-if-absent; on a LOCAL (POSIX) filesystem rename OVERWRITES the
    * destination atomically — two racing claimers would both "succeed"
    * and one commit would vanish (the concurrent-writer hammer spec
    * caught exactly this) — so the claim is a HARD LINK instead, which
    * POSIX link(2) refuses atomically when the destination exists,
    * making the complete tmp content appear at the destination name in
    * one operation. (An object store without atomic put-if-absent needs
    * an external coordinator — the documented Delta-on-S3 limitation,
    * out of scope.) The tmp file is always cleaned up.
    */
  private def putIfAbsent(fs: FileSystem, tmp: Path, dst: Path): Boolean = {
    val claimed =
      if (fs.getScheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(fs.makeQualified(dst).toUri.getPath),
            java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else !fs.exists(dst) && fs.rename(tmp, dst)
    if (fs.getScheme == "file" || !claimed) fs.delete(tmp, false)
    claimed
  }

  private def writeSmallFile(fs: FileSystem, log: Path, lines: Seq[String]): Path = {
    fs.mkdirs(log)
    val tmp = new Path(log, s".tmp_${java.util.UUID.randomUUID().toString.take(12)}")
    val out = fs.create(tmp, true)
    try out.write((lines :+ "").mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    tmp
  }

  /** Attempt to publish `lines` as EXACTLY version `v`: one atomic
    * put-if-absent is the commit point; a lost race throws
    * [[CommitConflict]]. Read-dependent commits call this with their
    * READ version + 1, so the conflict check is "nothing committed
    * since I read" — landing on any later number instead would silently
    * apply a rewrite derived from a stale snapshot (write skew: a
    * concurrent append's rows would dodge a delete's predicate).
    *
    * Every CheckpointEvery-th committed version also publishes a
    * checkpoint of the reconstructed state (best-effort put-if-absent:
    * the content at a version is a pure function of the log, so a
    * racing writer's copy is identical and the loser simply discards).
    */
  private[sources] def publishAt(spark: SparkSession, dir: String, v: Long,
      lines: Seq[String]): Unit = {
    val (fs, root) = fsFor(spark, dir)
    val log = logPath(root)
    val tmp = writeSmallFile(fs, log, lines)
    if (!putIfAbsent(fs, tmp, new Path(log, versionName(v))))
      throw new CommitConflict(
        s"version $v was claimed concurrently; re-read the tip and re-derive")
    if (v % CheckpointEvery == 0) writeCheckpoint(spark, dir, v)
  }

  /** Publish the reconstructed state at `v` as `v`'s checkpoint file.
    * Additive (no entry is destroyed) and idempotent (deterministic
    * content + put-if-absent), so races and replays are harmless.
    */
  private def writeCheckpoint(spark: SparkSession, dir: String, v: Long): Unit = {
    val (fs, root) = fsFor(spark, dir)
    val log = logPath(root)
    val st = stateAt(spark, dir, v)
    // carry removal stamps ONLY for directories still on disk: vacuum's
    // retention clock needs them until reclamation, after which the
    // entry would grow the checkpoint forever for a dir that no longer
    // exists — one dataRoot listing bounds the lines by physical dirs
    val dataRoot = new Path(root, "data")
    val present: Set[String] =
      if (!fs.exists(dataRoot)) Set.empty
      else fs.listStatus(dataRoot).toSeq.filter(_.isDirectory)
        .map(s => s"data/${s.getPath.getName}").toSet
    val lines =
      st.live.map(d => s"live:$d") ++
        st.live.flatMap(d => st.stats.getOrElse(d, Map.empty).toSeq.sortBy(_._1)
          .map { case (c, (lo, hi)) => s"stats:$d:$c:$lo:$hi" }) ++
        st.removedAt.toSeq.filter(e => present(e._1)).sortBy(_._1)
          .map { case (rel, t) => s"removed:$rel:$t" } ++
        st.txns.toSeq.sortBy(_._1).map { case (w, id) => s"txn:$w:$id" }
    val tmp = writeSmallFile(fs, log, lines)
    putIfAbsent(fs, tmp, new Path(log, ckptName(v)))
    ()
  }

  /** Publish `lines` at the next free version, retrying past lost races
    * — the APPEND path, whose validity is independent of the tip; the
    * data directory (uuid-keyed, not version-keyed) needs no rewrite,
    * so a retry is metadata-only.
    */
  private def publishNext(spark: SparkSession, dir: String, lines: Seq[String]): Long = {
    var attempts = 0
    while (attempts < 64) {
      val v = versions(spark, dir).lastOption.getOrElse(0L) + 1
      try {
        publishAt(spark, dir, v, lines)
        return v
      } catch { case _: CommitConflict => attempts += 1 }
    }
    throw new CommitConflict(s"could not claim a version in 64 attempts: $dir")
  }

  /** Write `df` as one new data directory (not yet visible). */
  private def writeData(spark: SparkSession, dir: String, df: DataFrame): String = {
    val rel = s"data/${java.util.UUID.randomUUID().toString.take(12)}"
    df.write.mode("overwrite").parquet(s"$dir/$rel")
    rel
  }

  /** `stats:` lines for a just-written directory: min/max of each
    * requested column, read back from the written parquet — a
    * column-pruned, footer-cheap scan, so recording stats never
    * re-scans the input frame. Integer/date columns only (stored as
    * exact longs — days since epoch for dates); an all-null column
    * records nothing (the directory stays unprunable on it — safe).
    */
  private def statsLines(spark: SparkSession, dir: String, rel: String,
      statsCols: Seq[String]): Seq[String] = {
    if (statsCols.isEmpty) return Nil
    statsCols.foreach(c => require(!c.contains(":") && c.nonEmpty,
      s"stats column names must be non-empty and colon-free: '$c'"))
    // an empty write leaves no part files (nothing to read, no stats —
    // the directory simply stays unprunable, which is vacuously right)
    val (fs, root) = fsFor(spark, dir)
    val hasFiles = fs.listStatus(new Path(root, rel))
      .exists(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    if (!hasFiles) return Nil
    val df = spark.read.parquet(s"$dir/$rel")
    statsCols.foreach { c =>
      val dt = df.schema(c).dataType
      require(Seq(LongType, IntegerType, ShortType, ByteType, DateType).contains(dt),
        s"stats need an integer/date column, $c is $dt")
    }
    val aggs = statsCols.flatMap { c =>
      val v = if (df.schema(c).dataType == DateType)
        org.apache.spark.sql.functions.datediff(col(c),
          org.apache.spark.sql.functions.lit(java.sql.Date.valueOf("1970-01-01")))
      else col(c)
      Seq(min(v).cast(LongType).as(s"lo_$c"), max(v).cast(LongType).as(s"hi_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    statsCols.zipWithIndex.flatMap { case (c, i) =>
      if (row.isNullAt(2 * i)) Nil
      else Seq(s"stats:$rel:$c:${row.getLong(2 * i)}:${row.getLong(2 * i + 1)}")
    }
  }

  /** APPEND `df` as a new version, optionally recording per-directory
    * min/max stats for `statsCols` (see [[snapshotRange]]). Returns the
    * committed version.
    */
  def append(spark: SparkSession, dir: String, df: DataFrame,
      statsCols: Seq[String] = Nil): Long = {
    val rel = writeData(spark, dir, df)
    publishNext(spark, dir,
      Seq("op:append", s"add:$rel") ++ statsLines(spark, dir, rel, statsCols))
  }

  /** Highest transaction id `writerId` has committed (the Delta `txn`
    * action): the idempotence ledger for at-least-once upstreams.
    * Checkpoint-seeded — the scan is bounded by CheckpointEvery, not
    * the table's commit history.
    */
  def lastTxn(spark: SparkSession, dir: String, writerId: String): Option[Long] = {
    val vs = versions(spark, dir)
    if (vs.isEmpty) return None
    stateAt(spark, dir, vs.last).txns.get(writerId)
  }

  /** TRANSACTIONAL append for an at-least-once upstream (a streaming
    * micro-batch): the entry records `txn:<writerId>:<txnId>`, and a
    * replay whose txnId is at or below [[lastTxn]] is SKIPPED whole
    * (returns None) — the at-least-once upstream becomes exactly-once
    * in the table, Delta's idempotent-writes rule. Requires txn ids
    * monotonically increasing per writer (a streaming batchId is) and a
    * SINGLE live writer per writerId (the [[Segments]] single-writer
    * contract; concurrent writers under DIFFERENT ids stay safe — the
    * ledger is per-writer).
    */
  def appendTxn(spark: SparkSession, dir: String, df: DataFrame,
      writerId: String, txnId: Long, statsCols: Seq[String] = Nil): Option[Long] = {
    require(!writerId.contains(":") && writerId.nonEmpty,
      s"writerId must be non-empty and colon-free: '$writerId'")
    if (lastTxn(spark, dir, writerId).exists(_ >= txnId)) return None
    val rel = writeData(spark, dir, df)
    Some(publishNext(spark, dir,
      Seq("op:append", s"txn:$writerId:$txnId", s"add:$rel")
        ++ statsLines(spark, dir, rel, statsCols)))
  }

  /** OVERWRITE the table with `df`: one entry adds the new directory
    * and removes every directory live at the READ version; commits at
    * read + 1, so any concurrent commit aborts this one with
    * [[CommitConflict]].
    */
  def overwrite(spark: SparkSession, dir: String, df: DataFrame,
      statsCols: Seq[String] = Nil): Long = {
    val readV = versions(spark, dir).lastOption.getOrElse(0L)
    val before = if (readV == 0L) Nil else liveDirs(spark, dir, Some(readV))
    val rel = writeData(spark, dir, df)
    publishAt(spark, dir, readV + 1,
      Seq("op:overwrite", s"add:$rel") ++ statsLines(spark, dir, rel, statsCols)
        ++ before.map(d => s"remove:$d"))
    readV + 1
  }

  /** Copy-on-write DELETE: rewrite the rows NOT matching `predicate`
    * into one new directory, commit add + remove-of-live at the READ
    * version + 1 — a commit racing in after the read aborts this one
    * (its rewrite would not cover the newcomer's rows).
    */
  def delete(spark: SparkSession, dir: String, predicate: Column,
      statsCols: Seq[String] = Nil): Long = {
    val readV = tipVersion(spark, dir)
    val before = liveDirs(spark, dir, Some(readV))
    // rewrites always read schema-merged: a copy-on-write under additive
    // evolution must carry every live column, never silently drop one
    val survivors = spark.read.option("mergeSchema", "true")
      .parquet(before.map(d => s"$dir/$d"): _*)
      .filter(!predicate)
    val rel = writeData(spark, dir, survivors)
    publishAt(spark, dir, readV + 1,
      Seq("op:delete", s"add:$rel") ++ statsLines(spark, dir, rel, statsCols)
        ++ before.map(d => s"remove:$d"))
    readV + 1
  }

  /** MERGE INTO: apply a CDC upsert/delete log to the table with
    * last-writer-wins semantics ([[graft.operators.Cdc.applyLog]] — per
    * key the log's latest row wins; 'U' replaces/inserts wholesale, 'D'
    * removes) as ONE copy-on-write commit at the READ version + 1 — a
    * commit racing in between the read and the publish aborts this one
    * with [[CommitConflict]] (the merged rewrite was derived from a
    * snapshot that no longer is the table), the Delta serializable-
    * writer rule. The log carries the snapshot's columns plus `opCol` +
    * `orderCols`; see the Cdc contract.
    *
    * Scale shape is Cdc's: the LWW window shuffles only the
    * (batch-sized) log; the snapshot pays one left-anti probe against
    * the touched-key set. The rewrite is directory-granularity
    * copy-on-write like [[delete]] — and with `pruneByKeyStats` (single
    * key column with recorded stats) it narrows to the TOUCHED
    * directory set, the published Delta MERGE data-skipping shape: the
    * log's key span [kmin, kmax] is two driver scalars off the
    * batch-sized log, directories whose recorded key range cannot
    * overlap it are left completely untouched (a min/max-disjoint
    * directory provably contains no logged key, so `applyLog` would
    * pass its rows through byte-identical anyway), and only the
    * overlapping directories are read, merged, and removed. Statless
    * directories count as touched (safe). Inserts with far-flung keys
    * widen the span and erode the pruning — inherent to range-shaped
    * skipping, never incorrect.
    */
  def merge(spark: SparkSession, dir: String, log: DataFrame,
      keyCols: Seq[String], orderCols: Seq[String], opCol: String = "op",
      statsCols: Seq[String] = Nil, pruneByKeyStats: Boolean = false): Long = {
    val readV = tipVersion(spark, dir)
    val state = stateAt(spark, dir, readV)
    val touched: Seq[String] =
      if (!pruneByKeyStats || keyCols.size != 1) state.live
      else {
        val k = keyCols.head
        val mm = log.agg(min(col(k).cast(LongType)).as("lo"),
          max(col(k).cast(LongType)).as("hi")).collect()(0)
        if (mm.isNullAt(0)) Nil // empty log still commits (idempotent shape)
        else state.live.filter { d =>
          state.stats.get(d).flatMap(_.get(k)) match {
            case Some((dLo, dHi)) => dHi >= mm.getLong(0) && dLo <= mm.getLong(1)
            case None => true
          }
        }
      }
    // zero touched directories still needs the table SCHEMA (the log may
    // carry pure inserts): an always-false filter over the live set
    // plans to an empty relation without scanning a row
    val snap =
      if (touched.nonEmpty)
        spark.read.option("mergeSchema", "true")
          .parquet(touched.map(d => s"$dir/$d"): _*)
      else
        spark.read.option("mergeSchema", "true")
          .parquet(state.live.map(d => s"$dir/$d"): _*)
          .filter(org.apache.spark.sql.functions.lit(false))
    val merged = graft.operators.Cdc.applyLog(snap, log, keyCols, orderCols, opCol)
    val rel = writeData(spark, dir, merged)
    publishAt(spark, dir, readV + 1,
      Seq("op:merge", s"add:$rel") ++ statsLines(spark, dir, rel, statsCols)
        ++ touched.map(d => s"remove:$d"))
    readV + 1
  }

  /** Delta-style `replaceWhere` for a stats column range: atomically
    * replace the rows with `lo <= colName <= hi` by `df`'s rows (which
    * must ALL lie inside the range — the published replaceWhere
    * constraint, verified before anything publishes) as ONE commit at
    * the READ version + 1 (conflict = abort). The per-partition payoff
    * comes from the stats: live directories whose recorded range CANNOT
    * overlap `[lo, hi]` are left completely untouched — not rewritten,
    * not removed, their stats intact — so a partitioned-append layout
    * (one range-disjoint directory per append, the q219 decile shape)
    * pays a logical per-partition replace: only overlapping directories
    * are copy-on-write rewritten to their out-of-range survivors.
    * Statless directories count as overlapping (safe default).
    */
  def replaceRange(spark: SparkSession, dir: String, df: DataFrame,
      colName: String, lo: Long, hi: Long,
      statsCols: Seq[String] = Nil): Long = {
    require(lo <= hi, s"empty range: $lo > $hi")
    val readV = tipVersion(spark, dir)
    val state = stateAt(spark, dir, readV)
    val (touched, _) = state.live.partition { d =>
      state.stats.get(d).flatMap(_.get(colName)) match {
        case Some((dLo, dHi)) => dHi >= lo && dLo <= hi
        case None => true
      }
    }
    val violations =
      df.filter(col(colName) < lo || col(colName) > hi || col(colName).isNull).count()
    require(violations == 0,
      s"replaceRange: $violations incoming rows fall outside [$lo, $hi] on $colName " +
        "— the replaceWhere constraint (replaced region and replacement must coincide)")
    val newRel = writeData(spark, dir, df)
    // out-of-range survivors of the overlapping directories, rewritten
    // copy-on-write (schema-merged like every rewrite); skipped when
    // empty — an all-covered directory is simply removed
    val survivorAdds: Seq[String] =
      if (touched.isEmpty) Nil
      else {
        val sv = spark.read.option("mergeSchema", "true")
          .parquet(touched.map(d => s"$dir/$d"): _*)
          .filter(col(colName) < lo || col(colName) > hi || col(colName).isNull)
        if (sv.isEmpty) Nil else Seq(writeData(spark, dir, sv))
      }
    val adds = (newRel +: survivorAdds).flatMap(rel =>
      Seq(s"add:$rel") ++ statsLines(spark, dir, rel, statsCols))
    publishAt(spark, dir, readV + 1,
      Seq("op:replace") ++ adds ++ touched.map(d => s"remove:$d"))
    readV + 1
  }

  /** Log-transacted compaction: merge the live directories into one,
    * commit add + removes at the READ version + 1 (a racing commit
    * aborts — rewriting files another commit just removed would
    * resurrect them). Pure layout — every version's SNAPSHOT is
    * unchanged, and pre-compaction versions stay readable until
    * [[vacuum]]. No-op (returns None) with fewer than two live dirs.
    */
  def compact(spark: SparkSession, dir: String,
      statsCols: Seq[String] = Nil): Option[Long] = {
    val readV = tipVersion(spark, dir)
    val before = liveDirs(spark, dir, Some(readV))
    if (before.size < 2) return None
    // schema-merged for the same reason as delete's rewrite
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(before.map(d => s"$dir/$d"): _*)
    val rel = writeData(spark, dir, merged)
    publishAt(spark, dir, readV + 1,
      Seq("op:compact", s"add:$rel") ++ statsLines(spark, dir, rel, statsCols)
        ++ before.map(d => s"remove:$d"))
    Some(readV + 1)
  }

  /** OPTIMIZE-style SMALL-FILE compaction: merge only the live
    * directories whose on-disk byte size is under `smallBytes`, leaving
    * larger directories completely untouched — the shape a long-lived
    * table actually needs at scale, where [[compact]]'s full-table
    * rewrite grows with the table (a streaming ingest's accumulated
    * history must never be rewritten just to fold in the latest
    * micro-batch directories). Same log transaction as [[compact]]:
    * add + removes-of-the-small-set at READ version + 1, abort on
    * conflict, every version's snapshot unchanged. No-op (None) with
    * fewer than two small directories — there is nothing to fold.
    */
  def compactSmall(spark: SparkSession, dir: String, smallBytes: Long,
      statsCols: Seq[String] = Nil): Option[Long] = {
    require(smallBytes > 0, s"smallBytes must be positive, got $smallBytes")
    val readV = tipVersion(spark, dir)
    val before = liveDirs(spark, dir, Some(readV))
    val (fs, root) = fsFor(spark, dir)
    val small = before.filter(d =>
      fs.getContentSummary(new Path(root, d)).getLength < smallBytes)
    if (small.size < 2) return None
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(small.map(d => s"$dir/$d"): _*)
    val rel = writeData(spark, dir, merged)
    publishAt(spark, dir, readV + 1,
      Seq("op:compact", s"add:$rel") ++ statsLines(spark, dir, rel, statsCols)
        ++ small.map(d => s"remove:$d"))
    Some(readV + 1)
  }

  /** Reclaim data directories: (a) directories a commit REMOVED, once
    * the REMOVING log entry is older than `horizonMs` — until then they
    * stay, so time travel works across the retention window, and after
    * reclamation snapshots older than the removal are gone (the
    * documented Delta retention trade, with the removing entry's mtime
    * as the removal timestamp); (b) orphan directories never committed
    * (crash debris between write and publish) whose own mtime is past
    * the horizon (protects in-flight writers). Driver-side walk;
    * returns reclaimed relative paths.
    */
  def vacuum(spark: SparkSession, dir: String,
      horizonMs: Long = 60L * 60 * 1000): Seq[String] = {
    val (fs, root) = fsFor(spark, dir)
    val dataRoot = new Path(root, "data")
    if (!fs.exists(dataRoot)) return Nil
    val vs = versions(spark, dir)
    // removal stamps ride the same checkpoint-seeded replay as every
    // other read (checkpoints carry removed:<rel>:<mtime> for dirs
    // still on disk), so vacuum's log walk is bounded by
    // CheckpointEvery too, not the table's whole commit history
    val state = if (vs.isEmpty) None else Some(stateAt(spark, dir, vs.last))
    val liveNow: Set[String] = state.map(_.live.toSet).getOrElse(Set.empty)
    val removedAt: Map[String, Long] = state.map(_.removedAt).getOrElse(Map.empty)
    val cutoff = System.currentTimeMillis() - horizonMs
    val reclaimed = scala.collection.mutable.ArrayBuffer.empty[String]
    fs.listStatus(dataRoot).toSeq.filter(_.isDirectory).foreach { st =>
      val rel = s"data/${st.getPath.getName}"
      val drop =
        if (liveNow.contains(rel)) false
        else removedAt.get(rel) match {
          case Some(t) => t < cutoff              // retention window expired
          case None => st.getModificationTime < cutoff // never committed: crash debris
        }
      if (drop) {
        try {
          if (fs.delete(st.getPath, true)) reclaimed += rel
        } catch { case _: java.io.IOException => () }
      }
    }
    reclaimed.toSeq
  }
}
