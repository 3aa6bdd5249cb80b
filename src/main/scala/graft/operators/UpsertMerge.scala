package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Staged merge/upsert — the core of the reference's store_* semantics.
  *
  * Given the current target state and an incoming staged batch, classify
  * every row as insert / update / keep and emit the merged final state.
  * "Changed" is decided by comparing a content hash of the non-key columns
  * (the reference's fingerprint trick), so the comparison is one narrow
  * column regardless of attribute width.
  *
  * Plan shape: ONE full-outer shuffle join on the natural key; both sides
  * hash their attributes map-side first. At 100 TB the join is the only
  * shuffle, AQE handles skewed keys, and the hash comparison never
  * materializes wide rows twice.
  */
object UpsertMerge {
  /** Actions emitted in the `action` column. */
  val Insert = "insert"; val Update = "update"; val Keep = "keep"

  /** @param target  current state (unique on keyCols)
    * @param source  incoming batch (unique on keyCols)
    * @param keyCols natural key
    * @param attrs   attribute columns carried to the output; a row is an
    *                update when any of them differ (null-safe). */
  def merge(target: DataFrame, source: DataFrame, keyCols: Seq[String], attrs: Seq[String]): DataFrame = {
    val t = target.select((keyCols ++ attrs).map(col): _*)
      .withColumn("__t_hash", StableId.stableId(attrs.map(col)))
      .withColumn("__t", lit(1))
    val s = source.select((keyCols ++ attrs).map(col): _*)
      .withColumn("__s_hash", StableId.stableId(attrs.map(col)))
      .withColumn("__s", lit(1))
    val sPref = s.select(keyCols.map(col) ++ attrs.map(c => col(c).as(s"__s_$c")) ++
      Seq(col("__s_hash"), col("__s")): _*)
    val joined = t.join(sPref, keyCols, "full_outer")
    val action = when(col("__t").isNull, Insert)
      .when(col("__s").isNull, Keep) // absent from batch: reference keeps rows, flags despawn separately
      .when(col("__t_hash") === col("__s_hash"), Keep)
      .otherwise(Update)
    // branch on batch PRESENCE (__s flag), never on attribute nullity —
    // coalesce(source, target) would silently block updating a field to NULL
    val outAttrs = attrs.map(c =>
      when(col("__s").isNull, col(c)).otherwise(col(s"__s_$c")).as(c))
    joined.select(keyCols.map(col) ++ outAttrs :+ action.as("action"): _*)
  }
}
