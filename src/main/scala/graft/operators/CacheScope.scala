package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Deterministic lifetime for operator-persisted blocks.
  *
  * Some operators ([[Dedup.ngramJaccardPairs]], [[Dedup.minhashLshPairs]],
  * [[Dedup.nearDupGroups]]) persist an expensive intermediate (the shingle
  * kernel output, the label frontier) because several structurally
  * different consumers would otherwise re-evaluate it. The returned frame
  * is lazy, so the operator itself can never release those blocks — only
  * the code that runs the consuming ACTION knows when they become garbage.
  *
  * `CacheScope.scoped { ... }` makes that ownership explicit: operators
  * route persists through [[CacheScope.pin]], which registers the frame
  * with the innermost active scope on the current thread; when the scope
  * exits (normally or exceptionally) every registered block is released.
  * Build the plan AND run its action inside the same scope:
  *
  * {{{
  * CacheScope.scoped {
  *   Dedup.ngramJaccardPairs(docs).write.parquet(out) // action inside
  * } // kernel blocks released here
  * }}}
  *
  * Outside any scope, `pin` degrades to a plain `persist` and the caller
  * owns release (`df.unpersist`/`spark.catalog.clearCache`) — the
  * pre-scope contract, kept for ad-hoc exploration where a leaked block
  * until session end is acceptable.
  *
  * Thread-local by design: Spark plans are built and actioned on the
  * driver thread that owns them, and a thread-local needs no session-global
  * listener machinery (whose callbacks are asynchronous — release timing
  * would be racy).
  */
final class CacheScope private[operators] () {
  private val pinned = scala.collection.mutable.ArrayBuffer[DataFrame]()

  private[operators] def register(df: DataFrame): Unit = synchronized { pinned += df }

  /** Release every registered block. Unpersist is idempotent, so frames an
    * operator already released early (e.g. per-round frontiers) are no-ops.
    */
  private[operators] def close(): Unit = synchronized {
    pinned.foreach(_.unpersist(blocking = false))
    pinned.clear()
  }
}

object CacheScope {
  private val active = new ThreadLocal[CacheScope]

  /** Run `body` under a fresh scope; release all blocks pinned during it,
    * even on exception. Nests: inner scopes shadow outer ones, and each
    * releases only its own pins.
    */
  def scoped[A](body: => A): A = {
    val s = new CacheScope
    val prev = active.get
    active.set(s)
    try body
    finally {
      active.set(prev)
      s.close()
    }
  }

  /** Persist `df` at `level` and hand its release to the innermost active
    * scope; without one, a plain persist owned by the caller.
    */
  private[graft] def pin(df: DataFrame, level: StorageLevel): DataFrame = {
    df.persist(level)
    adopt(df)
  }

  /** Register an ALREADY-persisted frame with the active scope (no-op
    * without one) — for operators that manage persists round-by-round but
    * whose final frame outlives them.
    */
  private[graft] def adopt(df: DataFrame): DataFrame = {
    Option(active.get).foreach(_.register(df))
    df
  }
}
