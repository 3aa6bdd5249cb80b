package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog compaction (CDC apply): reduce an ordered I/U/D change stream
  * to the final row state per key — the streaming generalization of the
  * reference's "update the database from the incoming batch".
  *
  * One shuffle on the key; the per-key reduction is a window row_number
  * (last change wins), then deletes drop out. Works identically as the
  * first step of snapshot+changelog merges: apply(changelog) ⋈ snapshot
  * via UpsertMerge.
  */
object CdcApply {
  val Insert = "I"; val Update = "U"; val Delete = "D"

  /** @param changelog rows of (key..., opCol ∈ {I,U,D}, orderCol, tieCol, attrs...)
    * @return the surviving final state: key + attrs of each key's last
    *         change, excluding keys whose last change is a delete. */
  def apply(changelog: DataFrame, keyCols: Seq[String], opCol: String,
      orderCol: String, tieCol: String, attrs: Seq[String]): DataFrame =
    liveView(foldState(None, changelog, keyCols, opCol, orderCol, tieCol, attrs),
      keyCols, opCol, orderCol, attrs)

  /** Incremental micro-batch fold: compact state ∪ batch to each key's
    * latest change, KEEPING delete tombstones in state — a delete must
    * keep shadowing older changes that arrive late or already sit in
    * state (dropping it would resurrect them on the next fold). The
    * reduction keys on (orderCol, tieCol) max-wins, so it is insensitive
    * to arrival order and batch boundaries — any micro-batching of the
    * same changelog converges to the same state (StreamingSpec streams
    * one). O(|state| + |batch|) per fold; one shuffle on the key.
    *
    * Retention: without a horizon, state grows with ALL keys ever seen —
    * on a high-churn 100 TB changelog the tombstone set dominates. Pass
    * `tombstoneHorizon` = the source's replay watermark (no change older
    * than it can still arrive): tombstones whose orderCol sits below it
    * have nothing left to shadow and are dropped after the compaction,
    * bounding state by |live keys| + |recent deletes|. */
  def foldState(state: Option[DataFrame], batch: DataFrame, keyCols: Seq[String],
      opCol: String, orderCol: String, tieCol: String, attrs: Seq[String],
      tombstoneHorizon: Option[Column] = None): DataFrame = {
    val cols = (keyCols ++ Seq(opCol, orderCol, tieCol) ++ attrs).map(col)
    val incoming = batch.filter(col(opCol).isin(Insert, Update, Delete)).select(cols: _*)
    val all = state.fold(incoming)(_.unionByName(incoming))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol).desc, col(tieCol).desc)
    val compacted = all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    tombstoneHorizon.fold(compacted)(h =>
      compacted.filter(col(opCol) =!= Delete || col(orderCol) >= h))
  }

  /** The queryable face of a folded state: tombstones drop out. */
  def liveView(state: DataFrame, keyCols: Seq[String], opCol: String,
      orderCol: String, attrs: Seq[String]): DataFrame =
    state.filter(col(opCol) =!= Delete)
      .select((keyCols ++ attrs :+ orderCol).map(col): _*)
}
