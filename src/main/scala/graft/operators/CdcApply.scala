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
      orderCol: String, tieCol: String, attrs: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol).desc, col(tieCol).desc)
    changelog
      .filter(col(opCol).isin(Insert, Update, Delete))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= Delete)
      .select((keyCols ++ attrs :+ orderCol).map(col): _*)
  }
}
