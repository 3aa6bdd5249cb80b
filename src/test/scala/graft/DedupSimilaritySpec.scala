package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{Dedup, MinHashLsh, SimHashDedup}
import graft.functions.VectorExpressions
import graft.similarity.Knn

class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again today"),
    (1L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near-dup of 0
    (2L, "completely different content about spark engines and data pipelines here"),
    (3L, "the quick brown fox jumps over the lazy dog again and again today")    // exact dup of 0
  ).toDF("doc_id", "text")

  test("exactGroups collapses exact duplicates to one group with min canonical id") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
    assert(g.count() == 3)
    val dup = g.filter(col("n_docs") === 2).collect()
    assert(dup.length == 1 && dup(0).getAs[Long]("canonical_id") == 0L)
  }

  test("MinHash LSH finds near-dups, not unrelated docs") {
    val pairs = MinHashLsh.candidatePairs(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)), "exact dup pair must always collide")
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 3L)), "near-dup should collide")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L), "unrelated doc must not collide")
  }

  test("jaccardOnPairs: exact dup has jaccard 1.0, near-dup high, and is deterministic") {
    val pairs = Seq((0L, 3L), (0L, 1L), (0L, 2L)).toDF("a_id", "b_id")
    val j = Dedup.jaccardOnPairs(pairs, docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((0L, 3L)) == 1.0)
    assert(j((0L, 1L)) > 0.5 && j((0L, 1L)) < 1.0)
    assert(j((0L, 2L)) == 0.0)
  }

  test("SimHash: identical texts get distance 0; near-dups small; unrelated large") {
    val sigs = SimHashDedup.signatures(spark, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    assert(ham(0L, 3L) == 0)
    assert(ham(0L, 1L) < ham(0L, 2L))
  }

  test("CosineSim expression matches a reference implementation on floats") {
    VectorExpressions.register(spark)
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f))).toDF("a", "b")
    val got = df.select(expr("cosine_sim(a, b)")).as[Double].head()
    val exp = {
      val (a, b) = (Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0))
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    assert(math.abs(got - exp) < 1e-12)
    // orthogonal + identical sanity
    val df2 = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)), (Array(1.0f, 1.0f), Array(1.0f, 1.0f)))
      .toDF("a", "b")
    val r = df2.select(expr("cosine_sim(a, b)")).as[Double].collect()
    assert(r(0) == 0.0 && math.abs(r(1) - 1.0) < 1e-12)
  }

  test("IVF ANN with trained centroids achieves recall against brute force, never exceeds k") {
    val dir = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") % 50 === 0)
    val brute = Knn.bruteForce(spark, e, q, "vec_id", "embedding", 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val cent = graft.similarity.Kmeans.fit(spark, e, "vec_id", "embedding", k = 8, iters = 2)
    val ivf = Knn.ivf(spark, e, q, cent, "vec_id", "embedding", 5, 2)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall > 0.2, s"recall $recall too low")
    assert(ivf.groupBy(_._1).values.forall(_.size <= 5))
  }

  test("IVF bucket assignment plan has no window sort — argmax via partial aggregation") {
    val dir = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, dir)
    val cent = e.limit(8).select(col("vec_id").as("c_id"),
      col("embedding").cast("array<double>").as("c_vec"))
    val p = Knn.assignBuckets(spark, e, cent, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"window in assignment subtree:\n$p")
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate") ||
      p.contains("SortAggregate"), p)
  }
}
