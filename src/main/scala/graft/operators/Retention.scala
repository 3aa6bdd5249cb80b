package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deletion-request propagation (right-to-be-forgotten / retention purge):
  * given a small table of subject keys, drop every matching row from the
  * parent table AND cascade through the child tables that reference it —
  * the deletion analogue of the reference's despawn bookkeeping, but a
  * HARD delete with an audit trail (regulators want counts, not silence).
  *
  * Scale shape: the request list is tiny next to the data (thousands of
  * subjects vs 100 TB of rows), so it broadcasts everywhere — each table
  * pays ONE narrow scan for its audit row and one broadcast anti-join for
  * its purged rewrite; no table ever shuffles. Pair with dynamic partition
  * overwrite (e_partition_overwrite) to rewrite only the partitions that
  * contained purged rows.
  */
object Retention {

  /** (table name, table, fk column referencing the subject key). */
  type Table = (String, DataFrame, String)

  private def reqKeys(requests: DataFrame, reqKey: String, as: String): DataFrame =
    broadcast(requests.select(col(reqKey).as(as)).distinct())

  /** Surviving rows of one table (broadcast anti-join on the request keys). */
  def purge(df: DataFrame, fkCol: String, requests: DataFrame, reqKey: String): DataFrame =
    df.join(reqKeys(requests, reqKey, fkCol), Seq(fkCol), "left_anti")

  /** One audit row per table — (table_name, n_total, n_purged, n_kept) —
    * each from a single scan (the broadcast left join marks hits; the
    * aggregate counts both sides at once). */
  def audit(tables: Seq[Table], requests: DataFrame, reqKey: String): DataFrame = {
    require(tables.nonEmpty, "Retention.audit needs at least one table")
    tables.map { case (name, df, fk) =>
      df.select(col(fk))
        .join(reqKeys(requests, reqKey, fk).withColumn("__hit", lit(1L)), Seq(fk), "left")
        // sum over ZERO rows is NULL — an empty table must still audit as 0
        .agg(count(lit(1)).as("n_total"),
          coalesce(sum(coalesce(col("__hit"), lit(0L))), lit(0L)).as("n_purged"))
        .select(lit(name).as("table_name"), col("n_total"), col("n_purged"),
          (col("n_total") - col("n_purged")).as("n_kept"))
    }.reduce(_ unionAll _)
  }
}
