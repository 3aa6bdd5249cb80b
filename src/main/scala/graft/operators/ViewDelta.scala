package graft.operators

import org.apache.spark.sql.DataFrame

/** Incremental JOIN-view maintenance — the join half of classic
  * incremental view maintenance ([[IncrementalAgg]] is the aggregate
  * half; the two compose: maintain the join view with this, then fold
  * its delta rows into downstream aggregates with IncrementalAgg.merge).
  *
  * For an inner equi-join view V = A ⋈ B and insert-only delta batches
  * ΔA, ΔB, the delta rule is
  *
  *   V' = V ∪ (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
  *
  * — the full new sides A' ⋈ B' are never re-joined. Updates/deletes are
  * out of scope here by design: run [[CdcApply]] first to fold a change
  * stream into insert-only effective batches, then maintain the view
  * from those.
  *
  * 100 TB shape: each of the three delta terms has a |Δ|-sized side, so
  * AQE plans them as broadcast joins whenever the batch fits (the usual
  * case — a batch is hours of arrivals, the base is years). The full-size
  * sides A and B are probed, not reshuffled: with the base tables
  * bucketed on the join key the two big-side terms are exchange-free on
  * that side, and the ΔA ⋈ ΔB term is batch-sized entirely. Cost per
  * refresh is O(|ΔA| + |ΔB| + matched rows), independent of |V|.
  */
object ViewDelta {

  /** Refresh V = A ⋈ B (inner equi-join on `keys`, both sides already
    * projected to the view's columns with the key columns under the same
    * names) with insert-only batches. `aOld`/`bOld` are the PRE-batch
    * sides — passing the post-batch sides would double-count ΔA ⋈ ΔB. */
  def refreshInsert(view: DataFrame,
                    aOld: DataFrame, aDelta: DataFrame,
                    bOld: DataFrame, bDelta: DataFrame,
                    keys: Seq[String]): DataFrame =
    view
      .unionByName(aDelta.join(bOld, keys))
      .unionByName(aOld.join(bDelta, keys))
      .unionByName(aDelta.join(bDelta, keys))

  /** DELETE-AWARE refresh: maintains V = A ⋈ B under a changelog with
    * inserts AND deletes, directly — no CdcApply pre-fold needed. Deletes
    * arrive as key frames (`aDel` with columns `aPk`, `bDel` with `bPk`):
    * every A row, B row and view row matching a deleted key is retracted
    * via anti-join (an update is a delete + insert, exactly what a
    * CdcApply changelog decomposes to). Derivation, with Aₖ = A ∖ ΔA⁻:
    *
    *   V' = Aₖ⋈Bₖ ∪ (ΔA⁺ ⋈ Bₖ) ∪ (Aₖ ⋈ ΔB⁺) ∪ (ΔA⁺ ⋈ ΔB⁺)
    *   Aₖ⋈Bₖ = V  ∖ (rows keyed by ΔA⁻) ∖ (rows keyed by ΔB⁻)
    *
    * — the second line holds because a view row exists iff both its side
    * rows survive, and the pk anti-joins remove exactly the rows whose
    * either side died.
    *
    * 100 TB shape: the three insert terms are |Δ|-sized as in
    * refreshInsert; the retractions are two anti-joins of V (and of each
    * base side) against batch-sized key sets — AQE broadcasts the key
    * frames, so V is scanned once but never reshuffled, and with V
    * bucketed on the keys the scan is exchange-free. Cost per refresh is
    * O(|V| scan + |Δ| join work), still independent of re-joining A'⋈B'. */
  def refresh(view: DataFrame,
              aOld: DataFrame, aIns: DataFrame, aDel: DataFrame, aPk: Seq[String],
              bOld: DataFrame, bIns: DataFrame, bDel: DataFrame, bPk: Seq[String],
              keys: Seq[String]): DataFrame = {
    val aKept = aOld.join(aDel, aPk, "left_anti")
    val bKept = bOld.join(bDel, bPk, "left_anti")
    view
      .join(aDel, aPk, "left_anti")
      .join(bDel, bPk, "left_anti")
      .unionByName(aIns.join(bKept, keys))
      .unionByName(aKept.join(bIns, keys))
      .unionByName(aIns.join(bIns, keys))
  }
}
