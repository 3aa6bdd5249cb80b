package graft.dedup

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Exact + verified fuzzy dedup operators (SURVEY.md §2D). */
object Dedup {

  /** Exact dedup by normalized-content hash: one groupBy on the hash.
    * Output: one row per content group with multiplicity and canonical id
    * (min id — deterministic survivor pick). */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .withColumn("content_hash",
      md5(regexp_replace(lower(trim(col(textCol))), s"${graft.functions.TextFunctions.Ws}+", " ")))
      .groupBy(col("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("canonical_id"))

  /** Candidate pairs joined to both sides' distinct shingle sets plus the
    * intersection size — the shared scaffolding of every exact pair
    * metric. Only ever run on LSH candidates (the cross product never
    * materializes): shingles are computed ONLY for docs appearing in a
    * pair (semi-join pushdown), because at scale the candidate set is a
    * sliver of the corpus and feature extraction is the expensive part.
    * Intersection via array_intersect — set semantics on the distinct
    * shingle arrays, same as DuckDB's list_intersect. Output columns:
    * a_id, b_id, a_sh, b_sh, inter. */
  private def pairShingles(pairs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val ids = pairs.select(col("a_id").as(idCol))
      .union(pairs.select(col("b_id").as(idCol))).distinct()
    val sh = docs.join(ids, Seq(idCol), "left_semi")
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), shingles3(tokens(col(textCol))).as("sh"))
    val aSh = sh.select(col(idCol).as("a_id"), col("sh").as("a_sh"))
    val bSh = sh.select(col(idCol).as("b_id"), col("sh").as("b_sh"))
    pairs.join(aSh, "a_id").join(bSh, "b_id")
      .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))).cast("double"))
  }

  /** Asymmetric shingle CONTAINMENT for candidate pairs:
    * c_ab = |A∩B| / |A| (how much of A lies inside B) and the mirror c_ba.
    * Catches quotation/subset near-dups that Jaccard misses — a short doc
    * fully contained in a long one has high containment but low Jaccard
    * (|A∩B|/|A∪B| shrinks with the size gap). */
  def containmentOnPairs(pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String): DataFrame =
    pairShingles(pairs, docs, idCol, textCol)
      .withColumn("c_ab", col("inter") / size(col("a_sh")).cast("double"))
      .withColumn("c_ba", col("inter") / size(col("b_sh")).cast("double"))
      .select(col("a_id"), col("b_id"), col("c_ab"), col("c_ba"))

  /** Exact word-3-gram-shingle Jaccard for a set of candidate pairs.
    * Union by inclusion–exclusion so no concat allocs. */
  def jaccardOnPairs(pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String): DataFrame =
    pairShingles(pairs, docs, idCol, textCol)
      .withColumn("jaccard",
        col("inter") / (size(col("a_sh")) + size(col("b_sh")) - col("inter")).cast("double"))
      .select(col("a_id"), col("b_id"), col("jaccard"))
}
