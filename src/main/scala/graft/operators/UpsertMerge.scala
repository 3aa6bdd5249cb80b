package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Staged merge/upsert — the core of the reference's store_* semantics.
  *
  * Given the current target state and an incoming staged batch, classify
  * every row as insert / update / keep — or despawn, the reference's
  * signature behavior: rows absent from the source batch are soft-deleted
  * during the upsert, never dropped. "Changed" is decided by comparing a
  * content hash of the non-key columns (the reference's fingerprint trick),
  * so the comparison is one narrow column regardless of attribute width.
  *
  * Plan shape: ONE full-outer shuffle join on the natural key; both sides
  * hash their attributes map-side first. At 100 TB the join is the only
  * shuffle, AQE handles skewed keys, and the hash comparison never
  * materializes wide rows twice. The stamp/despawn bookkeeping is all
  * narrow projections on top of that same single join.
  */
object UpsertMerge {
  /** Actions emitted in the `action` column. */
  val Insert = "insert"; val Update = "update"; val Keep = "keep"
  /** Soft-delete action for target rows absent from the batch. */
  val Despawn = "despawn"

  /** @param target  current state (unique on keyCols)
    * @param source  incoming batch (unique on keyCols)
    * @param keyCols natural key
    * @param attrs   attribute columns carried to the output; a row is an
    *                update when any of them differ (null-safe).
    * @param despawnMissing when set, target rows absent from the batch get
    *                action `despawn` instead of `keep` (the reference's
    *                links-absent-get-soft-deleted semantics)
    * @param carryCols target-side bookkeeping columns passed through
    *                unchanged (null for inserts); never part of the change
    *                hash
    * @param emitPresence when set, adds an `in_batch` boolean column (the
    *                raw source-presence flag, needed by stamp maintenance
    *                which must distinguish keep-present from keep-absent) */
  def merge(target: DataFrame, source: DataFrame, keyCols: Seq[String], attrs: Seq[String],
      despawnMissing: Boolean = false, carryCols: Seq[String] = Nil,
      emitPresence: Boolean = false): DataFrame = {
    val t = target.select((keyCols ++ attrs ++ carryCols).map(col): _*)
      .withColumn("__t_hash", StableId.stableId(attrs.map(col)))
      .withColumn("__t", lit(1))
    val s = source.select((keyCols ++ attrs).map(col): _*)
      .withColumn("__s_hash", StableId.stableId(attrs.map(col)))
      .withColumn("__s", lit(1))
    val sPref = s.select(keyCols.map(col) ++ attrs.map(c => col(c).as(s"__s_$c")) ++
      Seq(col("__s_hash"), col("__s")): _*)
    val joined = t.join(sPref, keyCols, "full_outer")
    val action = when(col("__t").isNull, Insert)
      .when(col("__s").isNull, if (despawnMissing) Despawn else Keep)
      .when(col("__t_hash") === col("__s_hash"), Keep)
      .otherwise(Update)
    // branch on batch PRESENCE (__s flag), never on attribute nullity —
    // coalesce(source, target) would silently block updating a field to NULL
    val outAttrs = attrs.map(c =>
      when(col("__s").isNull, col(c)).otherwise(col(s"__s_$c")).as(c))
    val base = keyCols.map(col) ++ outAttrs ++ carryCols.map(col) :+ action.as("action")
    val cols = if (emitPresence) base :+ col("__s").isNotNull.as("in_batch") else base
    joined.select(cols: _*)
  }

  /** Merge with the reference's import bookkeeping: every row present in
    * the batch refreshes `lastCol` to `stamp`; inserts initialize
    * `firstCol`; rows absent from the batch are despawned (soft-deleted,
    * keeping their stamps). Reappearing despawned rows respawn — they are
    * reclassified `update` even when attribute-identical, so the cleared
    * flag reaches the sink; rows absent AGAIN stay soft-deleted but revert
    * to `keep` (no repeated writes for long-dead rows).
    *
    * `target` must carry firstCol/lastCol/despawnedCol (the state a
    * previous stamped import wrote). Same single-shuffle plan as merge. */
  def stampedMerge(target: DataFrame, source: DataFrame, keyCols: Seq[String],
      attrs: Seq[String], stamp: Column,
      firstCol: String = "first_imported", lastCol: String = "last_imported",
      despawnedCol: String = "despawned"): DataFrame = {
    val m = merge(target, source, keyCols, attrs, despawnMissing = true,
      carryCols = Seq(firstCol, lastCol, despawnedCol), emitPresence = true)
    val prevDesp = coalesce(col(despawnedCol), lit(false))
    m.withColumn("action",
        when(col("in_batch") && prevDesp && col("action") === Keep, Update)
          .when(!col("in_batch") && prevDesp, Keep)
          .otherwise(col("action")))
      .withColumn(firstCol, when(col("action") === Insert, stamp).otherwise(col(firstCol)))
      .withColumn(lastCol, when(col("in_batch"), stamp).otherwise(col(lastCol)))
      // an absent row always has a target side (full-outer invariant) and is
      // either newly despawned or stays despawned — so the flag IS !in_batch.
      // Overwrites the carried previous flag, hence ordered after prevDesp's
      // last read in the action remap above.
      .withColumn(despawnedCol, !col("in_batch"))
      .drop("in_batch")
  }
}
