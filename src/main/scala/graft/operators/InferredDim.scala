package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Late-arriving dimension (early-arriving fact) handling — the warehouse
  * pattern the reference's FK-first transaction order exists to protect:
  * a fact row may reference a dimension member its feed has not delivered
  * yet (an observation of a species not yet registered). Rather than
  * reject the fact or break the FK, the loader INFERS a placeholder
  * member for every fact key missing from the dimension, and a later
  * dimension delivery RESOLVES the placeholder in place — the surrogate
  * key (here the natural key itself) never changes, so facts loaded
  * against the placeholder stay valid.
  *
  * Scale shape: infer is one distinct over the fact FK column (map-side
  * partial — FK cardinality, not fact cardinality, crosses the wire)
  * anti-joined against the dimension (broadcastable when the dim is);
  * resolve is one keyed left join of dim-sized frames. Facts are never
  * rewritten — that is the point of the pattern.
  */
object InferredDim {

  /** Attribute value placeholder members carry until their real row
    * arrives. */
  val Placeholder = "(inferred)"

  /** The dimension plus an inferred placeholder member for every fact
    * key the feed has not delivered. Output: dim columns + `inferred`
    * flag. */
  def infer(dim: DataFrame, facts: DataFrame, key: String, attrs: Seq[String]): DataFrame = {
    val missing = facts.select(col(key)).distinct()
      .join(dim.select(col(key)), Seq(key), "left_anti")
    val placeholders = attrs.foldLeft(missing)((d, a) => d.withColumn(a, lit(Placeholder)))
    dim.select((col(key) +: attrs.map(col)): _*).withColumn("inferred", lit(false))
      .unionByName(placeholders.withColumn("inferred", lit(true)))
  }

  /** Apply a late dimension delivery to an inferred state: arrivals
    * overwrite placeholder attributes in place (original members keep
    * their attributes — the feed that created them stays authoritative;
    * a full attribute refresh is UpsertMerge's job). Output: dim columns
    * + `status` ∈ {original, resolved, still_inferred}. */
  def resolve(state: DataFrame, arrivals: DataFrame, key: String, attrs: Seq[String]): DataFrame = {
    val arr = attrs.foldLeft(arrivals.select((col(key) +: attrs.map(col)): _*))(
        (d, a) => d.withColumnRenamed(a, s"__a_$a"))
      .withColumn("__arrived", lit(true))
    state.join(arr, Seq(key), "left")
      .select(col(key) +:
        attrs.map(a => when(col("inferred") && coalesce(col("__arrived"), lit(false)),
          col(s"__a_$a")).otherwise(col(a)).as(a)) :+
        when(!col("inferred"), lit("original"))
          .when(coalesce(col("__arrived"), lit(false)), lit("resolved"))
          .otherwise(lit("still_inferred")).as("status"): _*)
  }
}
