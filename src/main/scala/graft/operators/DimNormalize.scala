package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dimension extraction + surrogate-key join-back.
  *
  * The reference's store_* functions take denormalized input and split it
  * into dimension tables keyed by content hash, rewriting the fact rows to
  * reference the surrogate. Because the surrogate is a *content hash*
  * (StableId), the fact side needs NO join to learn its dimension keys —
  * it computes them locally. Extracting the dimension table itself is a
  * distinct() on the dimension columns only (narrow shuffle of the small
  * projection, never the wide fact).
  */
object DimNormalize {
  /** Returns (dimTable, factWithSk). */
  def split(denorm: DataFrame, dimCols: Seq[String], factCols: Seq[String],
      skCol: String): (DataFrame, DataFrame) = {
    val sk = StableId.stableId(dimCols.map(col))
    val dim = denorm.select(dimCols.map(col): _*).distinct().withColumn(skCol, sk)
    val fact = denorm.select((factCols.map(col) :+ sk.as(skCol)): _*)
    (dim, fact)
  }
}
