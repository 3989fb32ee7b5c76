package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.sources.TxTable.{CommitConflict, LongStat}

/** MULTI-TABLE ATOMIC TRANSACTIONS — N tables, ONE commit (the r16
  * verdict's named beyond-Delta-OSS option; Delta can only commit to a
  * single table per transaction, so a fact table and its derived
  * side table — an aggregate, an ANN index, a lineage record — always
  * have a window where readers see one without the other).
  *
  * A GROUP is one [[TxTable]]-protocol commit log whose data
  * directories are NAMESPACED by table: `<group>/<table>/data/<uuid>`.
  * Because the log's unit of atomicity is the single put-if-absent
  * entry, a commit carrying `add:` lines for SEVERAL tables is atomic
  * across all of them BY CONSTRUCTION — no two-phase protocol, no
  * outcome pointer, no reader-side resolution: a snapshot at any
  * version either sees every table's slice of a transaction or none of
  * it. Time travel, in-commit timestamps, checkpoints, the
  * `_last_checkpoint` pointer, log retention, per-directory/per-file
  * stats, and the per-writer txn ledger all ride the SAME machinery
  * ([[TxTable.stateAt]] replays group logs unchanged — rels are opaque
  * strings to it), so a group pays nothing the single-table format
  * does not.
  *
  * The flagship shape: a streaming ingest commits the CORPUS slice and
  * its derived INDEX/AGGREGATE slice in one entry, exactly-once
  * through the same `txn:` ledger ([[appendMany]]'s `txn` parameter) —
  * downstream readers can join the two tables at ANY version without
  * skew.
  *
  * Scope (documented, enforced): group CONTENT is append-shaped —
  * atomic multi-table append/ingest ([[appendMany]], [[ingest]]) plus
  * atomic multi-table merge-on-read DELETE ([[deleteRowsMany]]: one
  * commit's deletion-vector sidecars erase rows from several tables at
  * the same version — zero rewrites); per-table merges/column-mapping/
  * constraints remain the single-table [[TxTable]]'s domain (a group
  * table needing them should be a referenced single table instead).
  * Each member table's
  * schema is a tracked log action (`schema:<table>:<b64 json>`, latest
  * line per table wins, carried by checkpoints/restore/clone exactly
  * like the single-table `schema:` action), so the per-commit write
  * gate reads the LOG, never parquet footers — the O(live-directories)
  * footer I/O a month-old streaming group would otherwise pay per
  * batch is gone (footer reads survive only as the legacy fallback for
  * groups written before tracking, counted in [[footerGateReads]], and
  * the first write to such a group upgrades it opportunistically).
  * Maintenance is group-aware: [[compactTable]] folds one member's
  * directory tail (and its deletion vectors), [[compactDvs]] retires
  * inert sidecars group-wide, and [[maintain]] composes them with the
  * shared checkpoint / log-retention / vacuum into the daemon pass —
  * single-table CONTENT surfaces pointed at a group dir are rejected
  * (they would collapse member namespacing); the shared `_log`-only
  * surfaces ([[TxTable.checkpoint]], [[TxTable.cleanupLog]],
  * [[TxTable.restore]], [[TxTable.cloneTable]], time travel, history)
  * work on groups unchanged.
  */
object TxGroup {

  /** Count of legacy footer-fallback schema reads on the [[appendMany]]
    * gate path (pre-tracking groups only) — observable so a spec can
    * pin the zero-footer-read contract on current-format groups.
    */
  private[sources] val footerGateReads = new java.util.concurrent.atomic.AtomicLong

  private def requireTableName(t: String): Unit =
    require(t.nonEmpty && !t.contains(":") && !t.contains("/") && !t.startsWith("_")
      && t != "data" && t != "dv",
      s"group table names must be non-empty, colon/slash-free, not 'data'/'dv', " +
        s"and not start with '_': '$t'")

  private def prefix(table: String): String = s"$table/data/"

  /** Live data directories of one member table at a state. */
  private def tableDirs(state: TxTable.TableState, table: String): Seq[String] =
    state.live.filter(_.startsWith(prefix(table)))

  /** The member tables with live data at `version` (default tip). */
  def tables(spark: SparkSession, dir: String,
      version: Option[Long] = None): Seq[String] =
    TxTable.resolvedState(spark, dir, version)._2.live
      .map(_.takeWhile(_ != '/')).distinct
      .filterNot(p => p.isEmpty || p == "data" || p == "dv")

  /** Snapshot-isolated read of ONE member table at `version` (default
    * tip) — the same single-parquet-scan plan as a [[TxTable.snapshot]],
    * over the table's namespaced directories only.
    */
  def snapshot(spark: SparkSession, dir: String, table: String,
      version: Option[Long] = None, mergeSchema: Boolean = false): DataFrame = {
    requireTableName(table)
    val (_, state) = TxTable.resolvedState(spark, dir, version)
    val dirs = tableDirs(state, table)
    require(dirs.nonEmpty,
      s"group $dir has no table '$table' at this version " +
        s"(tables: ${tables(spark, dir, version).mkString(", ")})")
    // the tracked per-table schema types the read deterministically
    // (post-evolution directories surface the RECORDED schema, old
    // directories read new columns as null — the single-table snapshot
    // rule); mergeSchema = true remains the explicit footer-union read
    TxTable.scanLiveDirs(spark, dir, state, dirs, mergeSchema,
      readerSchema = if (mergeSchema) None else trackedSchema(state, table))
  }

  /** Parse the tracked schema action of one member table, if any. */
  private def trackedSchema(state: TxTable.TableState,
      table: String): Option[org.apache.spark.sql.types.StructType] =
    state.tableSchemas.get(table).flatMap(j => scala.util.Try(
      org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType]).toOption)

  /** Reject a GROUP content surface pointed at a SINGLE-TABLE
    * ([[TxTable]]) directory — the MIRROR of
    * [[TxTable.requireSingleTableContent]]: root-level `data/` content
    * (or single-table metadata — a tracked root schema, a
    * generated/identity write contract, constraints, a column mapping)
    * means the log is a TxTable's, and an [[appendMany]] would publish
    * namespaced member directories BESIDE it — every subsequent
    * [[TxTable.snapshot]] reads ALL live directories, so the table's
    * own reads would silently union foreign member rows (wrong answers,
    * not an error — the same silent-corruption class as the
    * single-table-surface-on-a-group path, in the other direction).
    * An EMPTY directory passes: the first [[appendMany]] is how a
    * group is born. A legacy pre-schema-tracking single-table CLONE
    * (absolute references, no recorded schema) is the one shape this
    * cannot see — modern tables always track their schema.
    */
  private def requireGroupTarget(state: TxTable.TableState, dir: String,
      what: String): Unit = {
    val single = state.live.filter(d =>
      !TxTable.isAbsRef(d) && (d.startsWith("data/") || d.startsWith("dv/")))
    val meta =
      if (state.schemaJson.isDefined) Some("a tracked root schema")
      else if (state.genCols.nonEmpty || state.idCols.nonEmpty ||
        state.idHw.nonEmpty) Some("a generated/identity write contract")
      else if (state.constraints.nonEmpty) Some("constraints")
      else if (!state.colMap.isIdentity) Some("a column mapping")
      else None
    require(single.isEmpty && meta.isEmpty,
      s"$what targets $dir, a single-table TxTable directory (" +
        single.headOption.map(d => s"root-level content like '$d'")
          .getOrElse(meta.getOrElse("single-table metadata")) +
        ") — publishing namespaced member data beside it would make the " +
        "table's own reads silently union foreign rows; use the " +
        "single-table TxTable surfaces on it, and a fresh directory " +
        "for the group")
  }

  /** [[snapshot]] restricted to a stats-range conjunction — the
    * [[TxTable.snapshotWhere]] pruning over one member table's
    * directories (integer/date ranges; recorded per-directory stats
    * drop provably disjoint directories before the scan plans, the
    * residual filter re-applies exactly).
    */
  def snapshotRange(spark: SparkSession, dir: String, table: String,
      colName: String, lo: Long, hi: Long): DataFrame = {
    requireTableName(table)
    require(lo <= hi, s"empty range on $colName: $lo > $hi")
    val (_, state) = TxTable.resolvedState(spark, dir, None)
    val dirs = tableDirs(state, table)
    require(dirs.nonEmpty, s"group $dir has no table '$table'")
    val kept = dirs.filter(d =>
      state.stats.get(d).flatMap(_.get(colName)) match {
        case Some(LongStat(dLo, dHi)) => dHi >= lo && dLo <= hi
        case _ => true // missing/kind-mismatched stats never prune
      })
    val tracked = trackedSchema(state, table)
    val base =
      if (kept.isEmpty)
        TxTable.scanLiveDirs(spark, dir, state, dirs, mergeSchema = false,
            readerSchema = tracked)
          .filter(org.apache.spark.sql.functions.lit(false))
      else TxTable.scanLiveDirs(spark, dir, state, kept, mergeSchema = false,
        readerSchema = tracked)
    base.filter(col(colName) >= lo && col(colName) <= hi)
  }

  /** ATOMIC MULTI-TABLE APPEND: every (table, frame) lands as one data
    * directory under its table's namespace, and ONE log entry publishes
    * them all — readers at any version see every table's slice or none.
    * Each frame is schema-gated against ITS table's live schema (type
    * conflicts and silent drops rejected; new columns need
    * `allowAdditive`). With `txn = Some((writerId, txnId))` the commit
    * is LEDGERED exactly like [[TxTable.appendTxn]]: a replay at or
    * below the writer's ledger skips WHOLE-TRANSACTION (returns None) —
    * an at-least-once upstream commits the corpus AND its derived
    * tables exactly-once, atomically. A lost commit race re-reads the
    * tip, RE-GATES every table against the new state, and claims
    * gated-tip + 1 — the same serializable-gate shape as the
    * single-table append. Returns the committed version (None = txn
    * replay skipped).
    */
  def appendMany(spark: SparkSession, dir: String,
      writes: Seq[(String, DataFrame)],
      statsCols: Map[String, Seq[String]] = Map.empty,
      allowAdditive: Boolean = false,
      txn: Option[(String, Long)] = None): Option[Long] = {
    require(writes.nonEmpty, "appendMany needs at least one (table, frame)")
    writes.foreach { case (t, _) => requireTableName(t) }
    require(writes.map(_._1).distinct.size == writes.size,
      s"duplicate table in one transaction: ${writes.map(_._1).mkString(", ")}")
    statsCols.keys.foreach(requireTableName)
    // a typo'd stats key would otherwise silently drop stats recording
    // (and all future pruning) for the table it meant to name
    require(statsCols.keySet.subsetOf(writes.map(_._1).toSet),
      s"statsCols names tables not in this transaction: " +
        s"${(statsCols.keySet -- writes.map(_._1)).toSeq.sorted.mkString(", ")}")
    txn.foreach { case (w, _) =>
      require(!w.contains(":") && w.nonEmpty,
        s"writerId must be non-empty and colon-free: '$w'")
    }
    val (fs, root) = fsFor(spark, dir)
    // ledger probe BEFORE any data write: a replayed at-least-once batch
    // must be metadata-only (two small log reads), not a full redundant
    // write-then-delete (the in-loop re-check below still covers the
    // probe-to-publish race)
    txn.foreach { case (w, id) =>
      if (TxTable.lastTxn(spark, dir, w).exists(_ >= id)) return None
    }
    // write every table's directory (uuid-keyed, invisible until the one
    // entry publishes — a crash leaves vacuum-reclaimable debris, never
    // a partial transaction)
    val rels: Seq[(String, String, DataFrame)] = writes.map { case (t, df) =>
      val rel = s"$t/data/${java.util.UUID.randomUUID().toString.take(12)}"
      df.write.mode("overwrite").parquet(s"$dir/$rel")
      (t, rel, df)
    }
    def cleanup(): Unit = rels.foreach { case (t, rel, _) =>
      fs.delete(new Path(root, rel), true)
      // drop the namespace shells too if THIS write created them (a
      // non-recursive delete refuses a non-empty dir, so a real member
      // table's other directories are never touched) — a rejected
      // append must leave no trace, not an empty `<table>/data/` husk
      try {
        fs.delete(new Path(root, s"$t/data"), false)
        fs.delete(new Path(root, t), false)
      } catch { case _: java.io.IOException => () }
    }
    // any stats failure (non-stats-capable column, colon in a name)
    // must reclaim the just-written directories like every other
    // pre-publish rejection — nothing may leak until a vacuum
    val statsL =
      try rels.flatMap { case (t, rel, _) =>
        TxTable.statsLines(spark, dir, rel, statsCols.getOrElse(t, Nil))
      } catch { case e: Throwable => cleanup(); throw e }
    val baseLines = Seq("op:append") ++ txn.map { case (w, id) => s"txn:$w:$id" } ++
      rels.map { case (_, rel, _) => s"add:$rel" } ++ statsL
    // gate ONE table against the tracked `schema:<table>:` action (the
    // log, zero data reads — the steady state for every post-tracking
    // group) and return its post-write schema line when the log does not
    // already track it exactly: the first write of a table, an additive
    // evolution, or a legacy pre-tracking group being upgraded
    // opportunistically (whose gate reads footers ONCE more, counted)
    def gateTable(state: Option[TxTable.TableState], t: String,
        incoming: org.apache.spark.sql.types.StructType): Seq[String] = {
      val tracked = state.flatMap(trackedSchema(_, t))
      val existing = tracked.orElse {
        state.map(st => tableDirs(st, t)).filter(_.nonEmpty).flatMap { dirs =>
          footerGateReads.incrementAndGet()
          scala.util.Try(spark.read.option("mergeSchema", "true")
            .parquet(dirs.map(d => TxTable.dataPath(dir, d)): _*).schema).toOption
        }
      }
      existing.foreach(sch => TxTable.enforceWriteSchema(
        sch, incoming, allowAdditive, Set.empty, s"appendMany table '$t'"))
      val after = existing match {
        case None => incoming
        case Some(ex) =>
          val extras = incoming.fields.filterNot(f => ex.fieldNames.contains(f.name))
          if (extras.isEmpty) ex
          else org.apache.spark.sql.types.StructType(ex.fields ++ extras)
      }
      if (tracked.exists(tr => TxTable.sameTypeLoose(tr, after))) Nil
      else Seq(s"schema:$t:${TxTable.b64e(after.json)}")
    }
    // serializable gate loop: gate every table against the CURRENT
    // state, claim gated-tip + 1; a lost claim re-reads and RE-GATES
    // (schema lines re-derive against the new state too)
    var gatedTip = -1L
    var schemaL: Seq[String] = Nil
    var attempts = 0
    while (attempts < 64) {
      val curTip = TxTable.tipOrZero(spark, dir)
      if (curTip != gatedTip) {
        val state = if (curTip == 0) None else Some(TxTable.stateAt(spark, dir, curTip))
        txn.foreach { case (w, id) =>
          if (state.exists(_.txns.get(w).exists(_ >= id))) {
            cleanup() // a concurrent replay already committed this txn
            return None
          }
        }
        try {
          // the target must BE a group (or an empty dir a group is born
          // into) — member dirs published beside single-table content
          // would silently corrupt that table's reads (mirror guard)
          state.foreach(requireGroupTarget(_, dir, "appendMany"))
          schemaL = rels.flatMap { case (t, _, df) => gateTable(state, t, df.schema) }
        } catch { case e: IllegalArgumentException => cleanup(); throw e }
        gatedTip = curTip
      }
      try {
        // a tracked-schema line is a protocol-2 action (a protocol-1
        // reader would crash on its payload) — the commit that first
        // records one stamps the requirement (TxTable.SupportedProtocol)
        val protoL = if (schemaL.nonEmpty) Seq("protocol:2") else Nil
        TxTable.publishAt(spark, dir, gatedTip + 1, baseLines ++ schemaL ++ protoL)
        return Some(gatedTip + 1)
      } catch { case _: CommitConflict => attempts += 1 }
    }
    cleanup()
    throw new CommitConflict(
      s"appendMany could not claim a version in 64 attempts: $dir")
  }

  /** ATOMIC MULTI-TABLE DELETE — merge-on-read: ONE commit records a
    * deletion-vector sidecar per member table named in `deletes`, so
    * the rows vanish from every table at the SAME version (the GDPR
    * shape: erase a user from the corpus AND its derived index/
    * aggregate with no window where one still shows them). Zero data
    * rewritten — each sidecar holds the matching rows' (file, position)
    * pairs and every read anti-joins them away ([[TxTable.deleteRows]]
    * semantics per table, one atomic entry for all); the group's
    * append-shaped content is otherwise untouched. [[compactTable]] on
    * a member folds its vectors into a rewrite exactly like the single
    * table's (and [[compactDvs]] then retires the inert sidecars), so
    * an erase-heavy group's per-read anti-join cost stays bounded.
    *
    * `pruneHints` (per table, caller contract: every matching row
    * satisfies every hint conjunct) drop stats-disjoint directories
    * before any scan. With `txn`, the delete is LEDGERED exactly like
    * [[appendMany]] — an at-least-once eraser deletes exactly-once
    * (returns None on a replay). Conflicts resolve logically through
    * the same read-dependent protocol as the single-table delete: a
    * concurrent winner removing a scanned directory (or recording its
    * own vectors) aborts; blind appends retry past — appended rows
    * survive as if the append serialized after the delete
    * (WriteSerializable; `serializable = true` aborts on those too).
    * Deterministic predicates only, the published DELETE contract.
    *
    * File keys inside a vector are `data/<uuid>/<file>` (the last three
    * path segments — uuid-unique across member tables by the same
    * randomness every directory name already relies on).
    */
  def deleteRowsMany(spark: SparkSession, dir: String,
      deletes: Seq[(String, org.apache.spark.sql.Column)],
      pruneHints: Map[String, Seq[TxTable.StatsPred]] = Map.empty,
      txn: Option[(String, Long)] = None,
      serializable: Boolean = false): Option[Long] = {
    require(deletes.nonEmpty, "deleteRowsMany needs at least one (table, predicate)")
    deletes.foreach { case (t, _) => requireTableName(t) }
    require(deletes.map(_._1).distinct.size == deletes.size,
      s"duplicate table in one delete: ${deletes.map(_._1).mkString(", ")}")
    pruneHints.keys.foreach(requireTableName)
    require(pruneHints.keySet.subsetOf(deletes.map(_._1).toSet),
      s"pruneHints names tables not in this delete: " +
        s"${(pruneHints.keySet -- deletes.map(_._1)).toSeq.sorted.mkString(", ")}")
    txn.foreach { case (w, id) =>
      require(!w.contains(":") && w.nonEmpty,
        s"writerId must be non-empty and colon-free: '$w'")
      if (TxTable.lastTxn(spark, dir, w).exists(_ >= id)) return None
    }
    val readV = TxTable.tipVersion(spark, dir)
    val state = TxTable.stateAt(spark, dir, readV)
    requireGroupTarget(state, dir, "deleteRowsMany")
    val (fs, root) = fsFor(spark, dir)
    val dvRels = scala.collection.mutable.ArrayBuffer.empty[String]
    val allCandidates = scala.collection.mutable.Set.empty[String]
    try deletes.foreach { case (t, pred) =>
      val dirs = tableDirs(state, t)
      require(dirs.nonEmpty,
        s"group $dir has no table '$t' (tables: ${tables(spark, dir).mkString(", ")})")
      val candidates = dirs.filter(d =>
        pruneHints.getOrElse(t, Nil).forall(p =>
          TxTable.overlaps(state.stats.get(d).flatMap(_.get(p.colName)), p)))
      if (candidates.nonEmpty) {
        allCandidates ++= candidates
        val rel = s"dv/${java.util.UUID.randomUUID().toString.take(12)}"
        TxTable.scanLiveDirs(spark, dir, state, candidates,
            mergeSchema = true, keepMeta = true)
          .filter(pred)
          .select(col(TxTable.DvFileCol).as("f"), col(TxTable.DvPosCol).as("p"))
          .write.mode("overwrite").parquet(s"$dir/$rel")
        val hasFiles = fs.listStatus(new Path(root, rel))
          .exists(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        if (hasFiles) dvRels += rel
        else fs.delete(new Path(root, rel), true)
      }
    } catch { case e: Throwable =>
      dvRels.foreach(r => fs.delete(new Path(root, r), true))
      throw e
    }
    val lines = Seq("op:delete") ++
      txn.map { case (w, id) => s"txn:$w:$id" } ++ dvRels.map(r => s"dvf:$r")
    try Some(TxTable.publishReadDependent(spark, dir, readV, lines,
      TxTable.TxnProfile("deleteRowsMany", allCandidates.toSet, Set.empty,
        allowNewRows = !serializable)))
    catch { case e: Throwable =>
      dvRels.foreach(r => fs.delete(new Path(root, r), true))
      throw e
    }
  }

  /** Highest transaction id `writerId` committed to this group —
    * [[TxTable.lastTxn]] verbatim (same ledger, same checkpoint bound).
    */
  def lastTxn(spark: SparkSession, dir: String, writerId: String): Option[Long] =
    TxTable.lastTxn(spark, dir, writerId)

  /** MEMBER-SCOPED compaction: merge ONE member table's live
    * directories (all of them, or with `smallBytes` only the
    * sub-threshold tail — the [[TxTable.compactSmall]] shape a
    * long-lived ingest group needs, where accumulated history is never
    * rewritten to fold in the latest micro-batches) into one fresh
    * `<table>/data/<uuid>` directory, as one log-transacted commit.
    * Because the rewrite reads through the DV-applied scan, every
    * outstanding deletion-vector pair targeting this table's files is
    * FOLDED into the output and goes inert — a [[deleteRowsMany]]-heavy
    * group (the GDPR shape) caps its per-read anti-join cost here, then
    * [[compactDvs]] retires the inert sidecars. Other members'
    * directories and every version's snapshot are untouched (pure
    * layout); conflicts resolve logically like the single-table
    * [[TxTable.compact]] — blind [[appendMany]]s retry past, a winner
    * removing a source directory or recording new vectors aborts.
    * Stats recorded on the merged directories carry forward by default.
    * No-op (None) with fewer than two qualifying directories.
    */
  def compactTable(spark: SparkSession, dir: String, table: String,
      statsCols: Seq[String] = Nil,
      smallBytes: Option[Long] = None): Option[Long] = {
    requireTableName(table)
    val readV = TxTable.tipVersion(spark, dir)
    val state = TxTable.stateAt(spark, dir, readV)
    requireGroupTarget(state, dir, "compactTable")
    val all = tableDirs(state, table)
    require(all.nonEmpty,
      s"group $dir has no table '$table' (tables: ${tables(spark, dir).mkString(", ")})")
    val before = smallBytes match {
      case None => all
      case Some(sb) =>
        require(sb > 0, s"smallBytes must be positive, got $sb")
        val (fs, root) = fsFor(spark, dir)
        all.filter(d =>
          fs.getContentSummary(new Path(root, d)).getLength < sb)
    }
    if (before.size < 2) return None
    // the tracked schema types the rewrite deterministically (it is the
    // additive UNION of everything the member's directories hold, so
    // nothing can be dropped); legacy pre-tracking groups take the
    // footer-union read
    val tracked = trackedSchema(state, table)
    val merged = TxTable.scanLiveDirs(spark, dir, state, before,
      mergeSchema = tracked.isEmpty, readerSchema = tracked)
    val eff =
      if (statsCols.nonEmpty) statsCols
      else TxTable.carriedStatsCols(state, before, merged)
    val rel = s"$table/data/${java.util.UUID.randomUUID().toString.take(12)}"
    merged.write.mode("overwrite").parquet(s"$dir/$rel")
    Some(TxTable.publishReadDependent(spark, dir, readV,
      Seq("op:compact", s"add:$rel") ++
        TxTable.statsLines(spark, dir, rel, eff) ++
        before.map(d => s"remove:$d"),
      TxTable.TxnProfile("compactTable", before.toSet, Set.empty,
        allowNewRows = true)))
  }

  /** Fold the group's outstanding deletion-vector sidecars into one —
    * the [[TxTable.compactDvs]] kernel verbatim (sidecars are a
    * LOG-level resource shared by every member; pairs whose directory a
    * [[compactTable]] rewrote are dropped as inert, and stats of the
    * directories the survivors touch re-tighten). No-op (None) with
    * fewer than two outstanding sidecars.
    */
  def compactDvs(spark: SparkSession, dir: String,
      retightenStats: Boolean = true): Option[Long] = {
    val readV = TxTable.tipVersion(spark, dir)
    val state = TxTable.stateAt(spark, dir, readV)
    requireGroupTarget(state, dir, "TxGroup.compactDvs")
    TxTable.compactDvsImpl(spark, dir, readV, state, retightenStats)
  }

  /** One [[maintain]] pass's report, per member table. */
  final case class GroupMaintenance(
      compacted: Map[String, Option[Long]],
      dvCompactedVersion: Option[Long],
      checkpointedVersion: Long,
      vacuumed: Seq[String],
      logFilesCleaned: Seq[String])

  /** The group twin of [[TxTable.maintain]] — the OPTIMIZE-daemon pass
    * a long-lived group schedules: fold each member's sub-threshold
    * directory tail ([[compactTable]] with `smallBytes`), fold the
    * now-partly-inert deletion-vector sidecars ([[compactDvs]]), force
    * a fresh shared [[TxTable.checkpoint]] + pointer, reclaim expired
    * member-namespace data ([[vacuum]]) AND expired root `dv/` sidecars
    * ([[TxTable.vacuum]] — a group has no root `data/`, so the
    * single-table sweep is exactly the sidecar half), then expired log
    * metadata ([[TxTable.cleanupLog]], retention defaulting to the same
    * horizon). Each step is individually log-transacted/idempotent and
    * conflict-tolerant (a compaction losing to a live ingest skips this
    * pass, like the single-table daemon), so a crash mid-pass leaves a
    * consistent group and the next pass resumes.
    */
  def maintain(spark: SparkSession, dir: String,
      smallBytes: Long = 128L * 1024 * 1024,
      horizonMs: Long = 7L * 24 * 60 * 60 * 1000,
      logRetainMs: Option[Long] = None): GroupMaintenance = {
    // a daemon pointed at a SINGLE TABLE would silently never compact
    // (no member namespaces to fold) — fail loud, name the right
    // surface, through the ONE shared detector so the two rules
    // cannot drift
    val tip0 = TxTable.tipOrZero(spark, dir)
    if (tip0 > 0)
      requireGroupTarget(TxTable.stateAt(spark, dir, tip0), dir,
        "TxGroup.maintain")
    val compacted = tables(spark, dir).sorted.map { t =>
      t -> (try compactTable(spark, dir, t, smallBytes = Some(smallBytes))
      catch { case _: CommitConflict => None })
    }.toMap
    val dvc =
      try compactDvs(spark, dir)
      catch { case _: CommitConflict => None }
    val ckpt = TxTable.checkpoint(spark, dir)
    val vac = vacuum(spark, dir, horizonMs) ++
      TxTable.vacuum(spark, dir, horizonMs)
    val cleaned = TxTable.cleanupLog(spark, dir, logRetainMs.getOrElse(horizonMs))
    GroupMaintenance(compacted, dvc, ckpt, vac, cleaned)
  }

  /** Reclaim expired directories under the group's member-table
    * namespaces, by the [[TxTable.vacuum]] rules applied to
    * `<table>/data/` roots: a directory a [[compactTable]] REMOVED
    * reclaims once its removal STAMP is past `horizonMs` (pre-compaction
    * versions stay readable inside the retention window — the stamp,
    * never the dir's own mtime, which is write-time-old the moment the
    * remove lands); CRASH DEBRIS a failed [[appendMany]] wrote but
    * never published reclaims by its own mtime. Candidate table roots
    * are the first-level directories that are not the log or a
    * single-table data/dv root, so a table whose EVERY transaction
    * crashed pre-publish still gets swept. Root `dv/` sidecars are the
    * single-table sweep's job ([[TxTable.vacuum]] on the group dir —
    * [[maintain]] runs both). Returns reclaimed relative paths.
    */
  def vacuum(spark: SparkSession, dir: String,
      horizonMs: Long = 60L * 60 * 1000): Seq[String] = {
    val (fs, root) = fsFor(spark, dir)
    if (!fs.exists(root)) return Nil
    val tip = TxTable.tipOrZero(spark, dir)
    val state = if (tip == 0) None else Some(TxTable.stateAt(spark, dir, tip))
    val liveNow: Set[String] = state.map(_.live.toSet).getOrElse(Set.empty)
    val removedAt: Map[String, Long] = state.map(_.removedAt).getOrElse(Map.empty)
    val cutoff = System.currentTimeMillis() - horizonMs
    val reclaimed = scala.collection.mutable.ArrayBuffer.empty[String]
    val tableRoots = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory &&
        !Seq("_log", "data", "dv").contains(st.getPath.getName))
    tableRoots.foreach { t =>
      val dataRoot = new Path(t.getPath, "data")
      if (fs.exists(dataRoot)) {
        fs.listStatus(dataRoot).toSeq.filter(_.isDirectory).foreach { st =>
          val rel = s"${t.getPath.getName}/data/${st.getPath.getName}"
          val drop =
            if (liveNow.contains(rel)) false
            else removedAt.get(rel) match {
              case Some(ts) => ts < cutoff          // retention window expired
              case None => st.getModificationTime < cutoff // crash debris
            }
          if (drop) {
            try { if (fs.delete(st.getPath, true)) reclaimed += rel }
            catch { case _: java.io.IOException => () }
          }
        }
      }
    }
    reclaimed.toSeq
  }

  /** STREAMING multi-table ingest — the flagship shape the class doc
    * names, as one call: drain a parquet feed micro-batch by
    * micro-batch, DERIVE each batch's per-table frames (the corpus
    * slice plus whatever side tables ride with it — an aggregate, an
    * index shard, a lineage record), and commit them ATOMICALLY and
    * EXACTLY-ONCE per batch ([[appendMany]] with the batch id as the
    * txn id: a replayed batch skips whole-transaction, so no member
    * table can ever run ahead of another — the skew-free property no
    * per-table sink composition can give). Returns nothing; read the
    * group's tables with [[snapshot]] after the drain.
    */
  def ingest(spark: SparkSession, feedDir: String,
      feedSchema: org.apache.spark.sql.types.StructType,
      groupDir: String, checkpointDir: String,
      derive: DataFrame => Seq[(String, DataFrame)],
      writerId: String = "group-ingest",
      statsCols: Map[String, Seq[String]] = Map.empty,
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    var reader = spark.readStream.schema(feedSchema)
    maxFilesPerTrigger.foreach(m => reader = reader.option("maxFilesPerTrigger", m))
    val query = reader.parquet(feedDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendMany(spark, groupDir, derive(batch), statsCols,
          txn = Some((writerId, batchId)))
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    query.awaitTermination()
  }

  private def fsFor(spark: SparkSession, dir: String) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }
}
