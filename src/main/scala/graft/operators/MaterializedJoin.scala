package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental materialized-JOIN maintenance — the join sibling of
 * [[MaterializedAgg]]: keep a stored equi-join view `J = A ⋈ B`
 * current under insert and delete batches without re-joining the
 * corpus. Same reference gap as the aggregate case (the reference
 * recomputes every query against the live snapshot,
 * `app/routes_ai.py:91`): at 100 TB the dominant cost of serving a
 * fact⋈dim view is re-scanning unchanged data.
 *
 * The algebra is the classic delta-join decomposition: with inserts
 * ΔA/ΔB arriving against old states A/B,
 *   Δ(A ⋈ B) = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
 * so the refresh unions three joins in which at least one side is
 * change-sized. Deletes retract by PROVENANCE: every view row carries
 * its source-row keys, so deleting rows from A is one anti-join of the
 * view against the deleted A-keys (an update is a delete + insert
 * pair, the [[MaterializedAgg.refresh]] convention).
 *
 * Scale design: the delta side of each delta join is change-sized —
 * AQE broadcasts it when it fits, with NO forced hint (the
 * `leakageSafeSplit` lesson: a backfill's "delta" can be corpus-sized
 * and a forced broadcast would OOM exactly then). The old-side scan is
 * the refresh's real cost and is key-pruned when the stored state is
 * bucketed or partitioned by the join key ([[graft.sources.Bucketing]]
 * is the co-location path). Nothing in the refresh touches
 * `view ⋈ anything` — the stored view only flows through a union and
 * an anti-join on its own provenance columns.
 */
object MaterializedJoin {

  /** Bootstrap the view: one equi-join over the full bases. The view
    * keeps both sides' columns, so provenance keys for retraction are
    * whatever key columns the caller selected into `a` and `b`. */
  def build(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame =
    a.join(b, keyCols)

  /** Fold insert batches into the stored view: the three delta joins,
    * unioned onto the view untouched. `aOld`/`bOld` are the states the
    * view was built from (NOT including these inserts). */
  def refreshInserts(view: DataFrame, aOld: DataFrame, bOld: DataFrame,
      aIns: DataFrame, bIns: DataFrame, keyCols: Seq[String]): DataFrame =
    view
      .unionByName(aIns.join(bOld, keyCols))
      .unionByName(aOld.join(bIns, keyCols))
      .unionByName(aIns.join(bIns, keyCols))

  /** Apply an UPDATE batch to the A side: the documented
    * delete-then-insert convention as one call. `updA` carries the NEW
    * row images; their provenance keys (`idCols`, e.g. the fact's
    * primary key) retract the stale view rows, then the new images
    * fold in through the ΔA⋈B delta term (ΔB is empty by
    * construction, so the other two terms vanish). `bOld` is the
    * B state the view currently reflects. */
  def applyUpdatesA(view: DataFrame, bOld: DataFrame, updA: DataFrame,
      keyCols: Seq[String], idCols: Seq[String]): DataFrame =
    retract(view, updA.select(idCols.map(col): _*), idCols)
      .unionByName(updA.join(bOld, keyCols))

  /** Key-pruned old-side scan for a delta term: the delta's DISTINCT
    * join-key set is change-sized, so collect it (bounded by `maxKeys`)
    * and push it into the old side as an IN filter — against a
    * bucketed store ([[graft.sources.Bucketing]]) the scan then reads
    * ONLY the matching buckets (`SelectedBucketsCount` in the plan),
    * and sorted row-group stats skip within them. Semantically free
    * for an equi-join: old-side rows outside the delta's key set
    * cannot contribute to the term. Falls back to the unfiltered frame
    * when the key set exceeds `maxKeys` (a backfill-sized delta — an
    * IN list that size would bloat the plan for no pruning win) or
    * when the join key is composite (bucket pruning is single-column).
    */
  def oldSideKeyPruned(old: DataFrame, delta: DataFrame,
      keyCols: Seq[String], maxKeys: Int = 10000): DataFrame = {
    if (keyCols.size != 1) return old
    val k = keyCols.head
    val keys = delta.select(k).distinct().limit(maxKeys + 1).collect()
    if (keys.length > maxKeys) old
    else old.where(col(k).isin(keys.map(_.get(0)): _*))
  }

  /** [[refreshInserts]] with both old-side scans key-pruned via
    * [[oldSideKeyPruned]] — the store-co-location claim made concrete:
    * fold a small delta into a view over bucketed bases and each
    * old-side term reads only the buckets its delta keys hash to. */
  def refreshInsertsPruned(view: DataFrame, aOld: DataFrame, bOld: DataFrame,
      aIns: DataFrame, bIns: DataFrame, keyCols: Seq[String],
      maxKeys: Int = 10000): DataFrame =
    view
      .unionByName(aIns.join(oldSideKeyPruned(bOld, aIns, keyCols, maxKeys), keyCols))
      .unionByName(oldSideKeyPruned(aOld, bIns, keyCols, maxKeys).join(bIns, keyCols))
      .unionByName(aIns.join(bIns, keyCols))

  /** Retract view rows whose source row was deleted: one NULL-SAFE
    * anti-join on the deleted rows' provenance keys (null-safe so a
    * NULL-keyed source row retracts its view rows too, the
    * [[MaterializedAgg]]/suppressBelowK convention). `delKeys` holds
    * one row per deleted source row, projected to `idCols`. */
  def retract(view: DataFrame, delKeys: DataFrame, idCols: Seq[String]): DataFrame = {
    val renamed = delKeys.select(idCols.map(c => col(c).as(s"__del_$c")): _*)
    val cond = idCols.map(c => col(c) <=> col(s"__del_$c")).reduce(_ && _)
    view.join(renamed, cond, "left_anti")
  }
}
