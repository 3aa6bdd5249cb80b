package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-integrity checks the reference runs before every store_* upsert. */
object Checks {

  /** Natural-key uniqueness violations: the duplicated key tuples and their
    * multiplicities. One shuffle on the key. */
  def duplicates(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Foreign-key orphans: child rows whose fk has no match in the parent's
    * pk. Anti-join; Spark broadcasts the parent when it is small (dims),
    * which is the common case — no shuffle of the child fact table. */
  def fkOrphans(child: DataFrame, parent: DataFrame, fk: String, pk: String): DataFrame =
    child.join(parent.select(col(pk)), child(fk) === parent(pk), "left_anti")
}
