package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Similarity search over embedding columns (SURVEY.md §2E).
  *
  * Brute force is the exactness baseline: queries broadcast against the
  * corpus (the corpus never shuffles — the plan is a broadcast nested-loop
  * over the fact side, which is the right shape when |queries| ≪ |corpus|),
  * cosine via the native codegen'd expression, top-k per query via window.
  *
  * The IVF path is the 100 TB shape: corpus vectors are assigned once to
  * coarse centroids (bucketing ≈ partition pruning); each query probes only
  * `nprobe` buckets, so per-query work drops from O(N) to O(N·nprobe/C).
  */
object Knn {

  /** Exact top-k cosine neighbors for each query vector. The top-k runs
    * through the custom partial-TopK operator (graft.plans.TopK): each
    * corpus partition forwards at most k rows per query, so the shuffle
    * carries O(partitions·|Q|·k) rows instead of every scored pair — the
    * difference between shuffling kilobytes and the whole corpus at 100 TB.
    * Ranks are then assigned by a window over the tiny survivor set. */
  def bruteForce(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    VectorExpressions.register(spark)
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", expr("cosine_sim(q_vec, n_vec)"))
      .select(col("q_id"), col("n_id"), col("cos"))
    val top = graft.plans.TopK.perKey(scored, Seq("q_id"),
      Seq(col("cos").desc, col("n_id").asc), k)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    top.withColumn("rnk", row_number().over(w))
      .select(col("q_id"), col("n_id"), col("rnk"))
  }

  /** IVF-style ANN: coarse centroids, bucket assignment, nprobe probing. */
  def ivf(spark: SparkSession, corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    VectorExpressions.register(spark)
    val cent = centroids.select(col(idCol).as("c_id"), col(vecCol).as("c_vec"))
    // one-time bucket assignment: every corpus vector -> nearest centroid
    val wAssign = Window.partitionBy(col("n_id")).orderBy(col("c_cos").desc, col("c_id"))
    val buckets = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
      .crossJoin(broadcast(cent))
      .withColumn("c_cos", expr("cosine_sim(n_vec, c_vec)"))
      .withColumn("r", row_number().over(wAssign)).filter(col("r") === 1)
      .select(col("n_id"), col("n_vec"), col("c_id").as("bucket"))
    // each query probes its nprobe nearest centroids' buckets only
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("c_cos").desc, col("c_id"))
    val probes = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .crossJoin(broadcast(cent))
      .withColumn("c_cos", expr("cosine_sim(q_vec, c_vec)"))
      .withColumn("r", row_number().over(wProbe)).filter(col("r") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("c_id").as("bucket"))
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    probes.join(buckets, "bucket")
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", expr("cosine_sim(q_vec, n_vec)"))
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("rnk"))
  }
}
