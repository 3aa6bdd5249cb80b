package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-table reconciliation.
  *
  * The reference maintains many-to-many link tables (e.g. group membership)
  * by diffing the incoming link set against the stored one: new pairs are
  * inserted, missing pairs are soft-deleted (despawned), surviving pairs are
  * stamped. Single full-outer shuffle join on the pair key.
  */
object LinkDiff {
  val Added = "added"; val Removed = "removed"; val Kept = "kept"

  def diff(current: DataFrame, incoming: DataFrame, linkCols: Seq[String]): DataFrame = {
    val cur = current.select(linkCols.map(col): _*).distinct().withColumn("__c", lit(1))
    val inc = incoming.select(linkCols.map(col): _*).distinct().withColumn("__i", lit(1))
    cur.join(inc, linkCols, "full_outer")
      .select(linkCols.map(col) :+
        when(col("__c").isNull, Added).when(col("__i").isNull, Removed).otherwise(Kept).as("action"): _*)
  }
}
