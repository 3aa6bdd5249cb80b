package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.similarity.Knn

/** Similarity-search queries (SURVEY.md §2E). Output is (q_id, n_id, rank)
  * — ids only, because ranks are stable across engines (cosine is computed
  * with the identical fold order on both sides, and ties break on n_id)
  * while raw floats in output would be fragile for no benefit. */
object Similarity {

  private def queriesSubset(e: DataFrame): DataFrame = e.filter(col("vec_id") % 50 === 0)

  /** s_knn_brute: exact top-5 cosine neighbors per query vector. */
  def sKnnBrute(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    Knn.bruteForce(s, e, queriesSubset(e), "vec_id", "embedding", k = 5)
      .orderBy(col("q_id"), col("rnk"))
  }

  private def dotSql(x: String, y: String) =
    s"list_reduce([CAST($x[i+1] AS DOUBLE) * CAST($y[i+1] AS DOUBLE) for i in range(0, len($x))], (p, q) -> p + q)"
  private def cosSql(a: String, b: String) =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  val sKnnBruteSql: String =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id % 50 = 0),
       |scored AS (
       |  SELECT q_id, e.vec_id AS n_id, ${cosSql("qe", "e.embedding")} AS cos
       |  FROM q, embeddings e WHERE e.vec_id <> q_id)
       |SELECT q_id, n_id, rnk FROM (
       |  SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
       |  FROM scored)
       |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin

  /** Collision-free per-dataset index location (same convention as the
    * ingest round-trip staging paths). */
  private def ivfPath(dir: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    // pid-scoped: a concurrent gate + bench run over the same dataset must
    // not overwrite-build the index files the other process is probing
    s"/tmp/graft_ivf_${h}_${ProcessHandle.current().pid()}"
  }

  /** s_knn_ivf: ANN through the PERSISTED IVF index — build once (trained
    * centroids, bucket-partitioned corpus on disk), then probe with static
    * partition pruning; nprobe=2. Approximate by construction → rows-only
    * oracle; IvfIndexSpec checks pruning, idempotency and recall. C is
    * pinned to 8 here (not the √N default) so the gate result is stable
    * across scale factors. */
  def sKnnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val path = ivfPath(dir)
    graft.similarity.IvfIndex.build(s, e, "vec_id", "embedding", path,
      numCentroids = Some(8), iters = 2)
    graft.similarity.IvfIndex.probe(s, path, queriesSubset(e), "vec_id", "embedding",
        k = 5, nprobe = 2)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** s_kmeans: deterministic Lloyd clustering (decimal-sum centroids) —
    * cluster-size profile after 3 iterations; rows-only oracle, KmeansSpec
    * checks convergence properties. */
  def sKmeans(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val centroids = graft.similarity.Kmeans.fit(s, e, "vec_id", "embedding", k = 8, iters = 3)
    val points = e.select(col("vec_id").as("p_id"),
      col("embedding").cast("array<double>").as("p_vec"))
    graft.similarity.Kmeans.assign(s, points, centroids)
      .groupBy(col("c_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("c_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_knn_brute" -> sKnnBrute _,
    "s_knn_ivf"   -> sKnnIvf _,
    "s_kmeans"    -> sKmeans _,
  )

  val oracle: Map[String, String] = Map(
    "s_knn_brute" -> sKnnBruteSql,
  )
}
