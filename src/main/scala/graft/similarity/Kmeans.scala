package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** DataFrame-native Lloyd's k-means over embedding columns — the centroid
  * trainer for the IVF index (SURVEY.md §2E).
  *
  * Deterministic throughout: seeds are the first k vectors by id (k-means++
  * would add per-run randomness), assignment ties break on centroid id.
  * Each iteration is one broadcast cross-score + one groupBy — no collect
  * of the corpus; only the k centroids ever return to the driver.
  */
object Kmeans {

  /** Nearest-centroid assignment (squared euclidean, ties on c_id) — the
    * single definition used by both the fit loop and downstream queries so
    * training and serving can never diverge. Input points need columns
    * (p_id, p_vec:array<double>); centroids (c_id, c_vec:array<double>).
    *
    * Argmin via `min_by` over a lexicographic (distance, c_id) struct, NOT a
    * row_number window: partial aggregation collapses the N·C scored rows to
    * one row per point map-side, so the shuffle carries N rows and nothing
    * sorts — a window here would shuffle and sort all N·C rows every Lloyd
    * iteration. A NULL distance (degenerate vector) is coalesced to +∞ so
    * the row still lands in a deterministic bucket instead of being dropped
    * by min_by's NULL-skipping. */
  /** Squared euclidean via the codegen'd dot products: |p|²−2p·c+|c|² —
    * ONE definition of the term order, because every consumer's oracle
    * parity (s_kmeans, s_knn_ivf, s_pq, s_pq_search) depends on all
    * engine-side copies folding in exactly this shape. */
  def sqEuclideanExpr(p: String, c: String): org.apache.spark.sql.Column =
    expr(s"dot_product($p, $p) - 2 * dot_product($p, $c) + dot_product($c, $c)")

  /** Column-based twin of sqEuclideanExpr — IDENTICAL fold shape
    * ((p·p − 2·p·c) + c·c), for call sites where the operands are built
    * expressions (e.g. a literal codebook vector) instead of named
    * columns. Requires VectorExpressions.register on the session. */
  def sqEuclidean(p: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    call_function("dot_product", p, p) - lit(2) * call_function("dot_product", p, c) +
      call_function("dot_product", c, c)

  def assign(spark: SparkSession, points: DataFrame, centroids: DataFrame): DataFrame = {
    VectorExpressions.register(spark)
    points.crossJoin(broadcast(centroids))
      .withColumn("d", sqEuclideanExpr("p_vec", "c_vec"))
      .groupBy(col("p_id"))
      .agg(min_by(struct(col("p_vec"), col("c_id"), col("c_vec"), col("d")),
        struct(coalesce(col("d"), lit(Double.MaxValue)), col("c_id"))).as("b"))
      .select(col("p_id"), col("b.p_vec").as("p_vec"), col("b.c_id").as("c_id"),
        col("b.c_vec").as("c_vec"), col("b.d").as("d"))
  }

  /** @return (centroidId, centroid) dataframe: columns c_id, c_vec. */
  def fit(spark: SparkSession, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    VectorExpressions.register(spark)
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    var centroids = corpus.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("c_id"), col(vecCol).cast("array<double>").as("c_vec"))
    val points = corpus.select(col(idCol).as("p_id"), col(vecCol).cast("array<double>").as("p_vec"))
    // ONE decimal-exact vector-sum aggregate for the whole embedding:
    // partitioning-invariant centroids (decimal summation) with O(1) plan
    // size at any dimension — `dim` separate sum columns would bloat the
    // plan and break codegen at real embedding widths
    val sumVec = org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.VectorDecimalSum(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(col("p_vec")), dim)
        .toAggregateExpression())
    for (_ <- 0 until iters) {
      val assigned = assign(spark, points, centroids)
      val newCentroids = assigned.groupBy(col("c_id"))
        .agg(count(lit(1)).as("n"), sumVec.as("s"))
        .select(col("c_id"), transform(col("s"), x => x / col("n")).as("c_vec"))
      // materialize the k centroid rows per iteration — otherwise the lazy
      // plans nest and every iteration recomputes all previous ones
      val rows = newCentroids.collect().toSeq
      centroids = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), newCentroids.schema)
    }
    centroids
  }
}
