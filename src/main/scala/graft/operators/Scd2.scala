package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD-2 interval building from a change stream.
  *
  * The reference tracks when each record version was first/last seen
  * (first_imported / last_imported) — the streaming generalization is
  * slowly-changing-dimension type 2: each (entity, value) change opens a
  * validity interval that closes when the next change arrives.
  *
  * One shuffle on the entity key; both the lead() and the is_current flag
  * share the same window sort.
  */
object Scd2 {
  /** @param changes  change stream: one row per observed (entity, value, ts)
    * @param entity   entity key column
    * @param orderCol monotonically increasing event-time column (exact type,
    *                 e.g. epoch micros)
    * @param tieCol   unique tiebreak column for deterministic ordering */
  def intervals(changes: DataFrame, entity: String, orderCol: String, tieCol: String,
      attrs: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(col(orderCol), col(tieCol))
    changes
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((Seq(entity) ++ attrs ++ Seq("valid_from", "valid_to", "is_current")).map(col): _*)
  }

  /** Point-in-time (AS OF) snapshot of an SCD2 history: the one version
    * per entity visible at time `t` — half-open interval semantics
    * [valid_from, valid_to), open intervals current. A narrow filter, so
    * it composes with partition pruning when the history is laid out by
    * validity period; no shuffle. */
  def asOf(history: DataFrame, t: org.apache.spark.sql.Column): DataFrame =
    history.filter(col("valid_from") <= t &&
      (col("valid_to").isNull || col("valid_to") > t))

  /** BITEMPORAL point query: "what did each entity look like at VALID
    * time v, as the warehouse KNEW it at transaction time t?" — the
    * audit/backfill read that plain SCD2 cannot answer (a late-arriving
    * correction rewrites history; the tx axis says when each version
    * became visible). Per entity: among change rows recorded by t
    * (txCol ≤ t), the one with the greatest valid timestamp ≤ v,
    * corrections to the same valid instant resolved by latest tx then
    * the unique tiebreak.
    *
    * Both time filters are narrow and reach the scan; the per-entity
    * argmax is one keyed window — a single shuffle, k=1 state. */
  def bitemporalAsOf(changes: DataFrame, entity: String, validCol: String,
      txCol: String, tieCol: String, attrs: Seq[String],
      v: org.apache.spark.sql.Column, t: org.apache.spark.sql.Column): DataFrame = {
    val w = Window.partitionBy(col(entity))
      .orderBy(col(validCol).desc, col(txCol).desc, col(tieCol).desc)
    changes.filter(col(txCol) <= t && col(validCol) <= v)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select((Seq(entity) ++ attrs ++ Seq(validCol, txCol)).map(col): _*)
  }
}
