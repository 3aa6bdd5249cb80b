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

  /** One-time IVF bucket assignment: every corpus vector → its nearest
    * centroid. Argmax via `max_by` over a struct, NOT a row_number window:
    * partial aggregation collapses the N·C scored rows to one row per
    * vector map-side, so the shuffle carries N rows and nothing sorts — a
    * window here would shuffle and sort all N·C rows. Ties break on the
    * smallest centroid id (the negated id inside the ordering struct).
    * Centroids must have columns (c_id, c_vec). */
  def assignBuckets(spark: SparkSession, corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    VectorExpressions.register(spark)
    corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
      .crossJoin(broadcast(centroids))
      // coalesce: a zero-norm vector scores NULL against every centroid and
      // max_by skips NULL orderings — it would silently vanish from all
      // buckets; -1 keeps it, deterministically in the smallest-id bucket
      .withColumn("c_cos", coalesce(expr("cosine_sim(n_vec, c_vec)"), lit(-1.0)))
      .groupBy(col("n_id"))
      .agg(max_by(struct(col("c_id"), col("n_vec")),
        struct(col("c_cos"), negate(col("c_id")))).as("b"))
      .select(col("n_id"), col("b.n_vec").as("n_vec"), col("b.c_id").as("bucket"))
  }

  /** IVF-style ANN: coarse (trained) centroids, aggregation-based bucket
    * assignment, nprobe probing, and the k-bounded TopKPerKey shuffle for
    * the final neighbor selection. Centroids must have columns
    * (c_id, c_vec) — e.g. the output of Kmeans.fit. */
  def ivf(spark: SparkSession, corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    VectorExpressions.register(spark)
    val buckets = assignBuckets(spark, corpus, centroids, idCol, vecCol)
    // each query probes its nprobe nearest centroids' buckets only; the
    // window is fine here — it only ever sees |Q|·C rows and |Q| ≪ N
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("c_cos").desc, col("c_id"))
    val probes = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .crossJoin(broadcast(centroids))
      .withColumn("c_cos", expr("cosine_sim(q_vec, c_vec)"))
      .withColumn("r", row_number().over(wProbe)).filter(col("r") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("c_id").as("bucket"))
    // probes are |Q|·nprobe rows — broadcast them EXPLICITLY: if this join
    // ever shuffled instead, the corpus-sized bucket table would hash on a
    // C-valued key (a guaranteed skew scale-killer at 100 TB)
    val scored = buckets.join(broadcast(probes), "bucket")
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", expr("cosine_sim(q_vec, n_vec)"))
      .select(col("q_id"), col("n_id"), col("cos"))
    val top = graft.plans.TopK.perKey(scored, Seq("q_id"),
      Seq(col("cos").desc, col("n_id").asc), k)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    top.withColumn("rnk", row_number().over(w))
      .select(col("q_id"), col("n_id"), col("rnk"))
  }
}
