package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Incremental maintenance of a JOIN view under insert-only deltas —
  * the join-shaped sibling of [[MaterializedAgg]]'s additive-aggregate
  * merge: given the OLD sides of `V = A ⋈ B` and this batch's new rows
  * `ΔA`/`ΔB`, produce the view delta
  *
  *   ΔV = ΔA ⋈ (B_old ∪ ΔB)  ∪  A_old ⋈ ΔB
  *
  * — the classic delta-algebra decomposition (the two pieces are
  * disjoint: every ΔV row uses a delta row on at least one side, and
  * the ΔA⋈ΔB rows appear only in the first piece). `V_old ∪ ΔV` then
  * equals the from-scratch join of the full tables, which is exactly
  * what the q167 oracle recomputes.
  *
  * Reference scope: the reference recomputes its join summaries from
  * the full tables each run; this is the daily-ingest shape at scale —
  * the view's measures re-aggregate through [[MaterializedAgg]] so the
  * corpus is never rescanned.
  *
  * Scale shape: both delta joins carry a DELTA-sized side, so Spark
  * broadcasts it when it fits (AQE decides from the delta's actual
  * size) and the corpus-side scan is semi-join-reducible — at 100 TB
  * the stored sides are bucketed on the join key ([[graft.sources
  * .Bucketed]]), making `A_old ⋈ ΔB` an exchange-free bucket-pruned
  * probe. No piece ever joins corpus × corpus.
  */
object JoinViewMaint {

  /** The view delta of `A ⋈_keys B` for insert-only deltas. Inputs must
    * share ONLY the join key columns (the usual view contract); the
    * output schema is the join schema.
    */
  def joinDelta(
      aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "join keys required")
    val clash = (aOld.columns.toSet -- keys)
      .intersect(bOld.columns.toSet -- keys)
    require(clash.isEmpty, s"non-key column names collide across sides: $clash")
    val bNew = bOld.unionByName(bDelta)
    aDelta.join(bNew, keys)
      .unionByName(aOld.join(bDelta, keys))
      .select((keys ++ aOld.columns.filterNot(keys.contains)
        ++ bOld.columns.filterNot(keys.contains)).map(col).toSeq: _*)
  }
}
