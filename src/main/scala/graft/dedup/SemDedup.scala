package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.similarity.Kmeans

/** SemDeDup-style SEMANTIC dedup (SURVEY.md §2D) — centroid-blocked
  * embedding dedup, the adaptive-blocking family next to EmbedLsh's
  * random hyperplanes: k-means clusters the space, exact cosine runs only
  * WITHIN each cluster, pairs at `cosMin` form components, and every
  * vector maps to its component-min canonical id.
  *
  * Scale shape:
  *  - EXACT-DUP COLLAPSE first: vectors with byte-identical embeddings
  *    (duplicate images re-ingested under new ids) collapse to their
  *    min-id representative before clustering, so an m-fold duplicate
  *    can never turn one cluster's pair step quadratic — identical
  *    vectors have cosine exactly 1 to the same neighbors, so the
  *    expanded components are unchanged (the fuzzyCanonical argument).
  *  - training collects k centroid rows only; assignment is a broadcast
  *    cross-score with map-side argmin (Kmeans.assign — no window);
  *  - the in-cluster pair join is an equi-join on the cluster id:
  *    comparisons are O(N²/k) in expectation. k is THE scale knob — size
  *    it as N / clusterBudget (SemDeDup uses ~constant docs per cluster)
  *    to hold per-cluster work flat as the corpus grows;
  *  - components shuffle edge-sized data (Components.labels).
  */
object SemDedup {

  /** canonical() with k DERIVED from a per-cluster document budget
    * instead of trusted from the caller: k = ceil(N / clusterBudget), so
    * expected in-cluster pair work stays ~budget²/2 per cluster no matter
    * how large the corpus grows — SemDeDup's constant-docs-per-cluster
    * rule made unskippable (VERDICT r7 #8: a caller passing small k at
    * large N got quadratic clusters with nothing enforcing the knob).
    * N comes from RowCountEstimate: parquet footer metadata for bare file
    * scans, a count() otherwise. */
  def canonicalBudgeted(s: SparkSession, e: DataFrame, idCol: String, vecCol: String,
      clusterBudget: Int, iters: Int, cosMin: Double): DataFrame = {
    require(clusterBudget > 0, s"clusterBudget must be positive, got $clusterBudget")
    val n = graft.sources.RowCountEstimate.estimate(e)
    canonical(s, e, idCol, vecCol, derivedK(n, clusterBudget), iters, cosMin)
  }

  /** The budget rule, exposed so specs and oracle builders use the same
    * arithmetic: k = ceil(N / budget), at least 1, clamped to Int range
    * (a k beyond 2³¹ means the budget is absurd for the corpus — clamping
    * keeps the arithmetic total rather than overflowing negative). */
  def derivedK(n: Long, clusterBudget: Int): Int =
    math.min(Int.MaxValue.toLong,
      math.max(1L, (n + clusterBudget - 1) / clusterBudget)).toInt

  /** (idCol, canonical_id) for every input vector; a vector survives
    * dedup iff canonical_id == its own id. `vecCol` must be castable to
    * array<double>. */
  def canonical(s: SparkSession, e: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, cosMin: Double): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val docs = e.select(col(idCol), col(vecCol).cast("array<double>").as(vecCol))
    // exact-dup collapse on the embedding bytes (md5 over the exact
    // double string forms — identity, not near-equality)
    val repMap = docs.select(col(idCol), col(vecCol),
        min(col(idCol)).over(Window.partitionBy(
          md5(concat_ws(",", expr(s"transform($vecCol, x -> cast(x AS string))"))))).as("__rep"))
      .localCheckpoint(false)
    val reps = repMap.filter(col(idCol) === col("__rep"))
      .select(col(idCol), col(vecCol)).localCheckpoint(false)
    val cent = Kmeans.fit(s, reps, idCol, vecCol, k, iters)
    val pts = reps.select(col(idCol).as("p_id"), col(vecCol).as("p_vec"))
    val assigned = Kmeans.assign(s, pts, cent)
      .select(col("p_id"), col("c_id"), col("p_vec")).localCheckpoint(false)
    val a = assigned.select(col("c_id"), col("p_id").as("a_id"), col("p_vec").as("a_v"))
    val b = assigned.select(col("c_id"), col("p_id").as("b_id"), col("p_vec").as("b_v"))
    val pairs = a.join(b, Seq("c_id")).filter(col("a_id") < col("b_id"))
      .withColumn("cos", expr("cosine_sim(a_v, b_v)"))
      .filter(col("cos") >= cosMin)
      .select(col("a_id"), col("b_id"))
    val canonReps = Components.canonicalize(reps.select(col(idCol)), idCol, pairs)
    repMap.join(canonReps.withColumnRenamed(idCol, "__rep"), Seq("__rep"))
      .select(col(idCol), col("canonical_id"))
  }
}
