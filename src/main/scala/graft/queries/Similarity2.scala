package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 similarity additions (SURVEY.md §2E). */
object Similarity2 {

  import Similarity.cosSql

  private val MutK = 5

  /** s_mutual_knn: the MUTUAL k-NN GRAPH over a bounded anchor panel —
    * the input structure of agglomerative semantic clustering and of
    * hubness diagnostics (a vector that appears in many neighbor lists
    * but reciprocates few is a hub — the curse-of-dimensionality signal
    * a retrieval stack monitors): directed top-5 cosine edges within the
    * panel, kept only where BOTH endpoints rank each other (a<b
    * canonical). Output: mutual edges with both ranks + cosine.
    *
    * Scale shape: the panel is bounded by construction (vec_id % 20 — at
    * 100 TB a sampled panel table); all-pairs scoring is panel×panel via
    * one broadcast, the per-vector top-5 rides the k-bounded TopKPerKey
    * shuffle (PlanSpec-pinned), and the mutual check is a self-join of
    * two k·|panel|-row edge lists on the canonical pair key. The full
    * corpus version composes with IVF-cell pruning exactly like
    * s_filtered_knn — candidates from probed cells only. */
  /** The directed top-k edge stage of s_mutual_knn, exposed pre-
    * checkpoint so PlanSpec can pin the TopKPerKey + broadcast shape
    * (the gate checkpoints it because both the fwd and bwd branches of
    * the mutual self-join consume it). */
  private[graft] def mutualKnnEdges(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val panel = Tables.embeddings(s, dir).filter(col("vec_id") % 20 === 0)
      .select(col("vec_id"), col("embedding"))
    val q = panel.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val scored = panel.select(col("vec_id").as("n_id"), col("embedding").as("n_vec"))
      .crossJoin(broadcast(q))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", expr("cosine_sim(q_vec, n_vec)"))
      .select(col("q_id"), col("n_id"), col("cos"))
    val top = graft.plans.TopK.perKey(scored, Seq("q_id"),
      Seq(col("cos").desc, col("n_id").asc), MutK)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    top.withColumn("rnk", row_number().over(w))
      .select(col("q_id"), col("n_id"), col("cos"), col("rnk"))
  }

  def sMutualKnn(s: SparkSession, dir: String): DataFrame = {
    val edges = mutualKnnEdges(s, dir).localCheckpoint(false)
    val fwd = edges.filter(col("q_id") < col("n_id"))
      .select(col("q_id").as("a"), col("n_id").as("b"),
        col("cos"), col("rnk").as("rank_ab"))
    val bwd = edges.filter(col("q_id") > col("n_id"))
      .select(col("n_id").as("a"), col("q_id").as("b"), col("rnk").as("rank_ba"))
    fwd.join(bwd, Seq("a", "b"))
      .select(col("a"), col("b"), col("cos"), col("rank_ab"), col("rank_ba"))
      .orderBy(col("a"), col("b"))
  }

  val sMutualKnnSql: String =
    s"""WITH panel AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 20 = 0),
       |scored AS (
       |  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
       |    ${cosSql("q.embedding", "e.embedding")} AS cos
       |  FROM panel q, panel e WHERE e.vec_id <> q.vec_id),
       |edges AS (
       |  SELECT q_id, n_id, cos, rnk FROM (
       |    SELECT q_id, n_id, cos,
       |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
       |    FROM scored)
       |  WHERE rnk <= $MutK)
       |SELECT f.q_id AS a, f.n_id AS b, f.cos, f.rnk AS rank_ab, r.rnk AS rank_ba
       |FROM edges f JOIN edges r ON r.q_id = f.n_id AND r.n_id = f.q_id
       |WHERE f.q_id < f.n_id
       |ORDER BY a, b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_mutual_knn" -> sMutualKnn _,
  )

  val oracle: Map[String, String] = Map(
    "s_mutual_knn" -> sMutualKnnSql,
  )
}
