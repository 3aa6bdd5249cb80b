package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.EmbedLsh

/** Pins EmbedLsh's operating point (VERDICT r5 #1): at the cos ≥ 0.9
  * near-dup regime the b=10 × r=12 hyperplane bands target, measured
  * recall against BRUTE-FORCE ground truth must meet the collision-curve
  * prediction 1 − (1 − p^r)^b, p = 1 − θ/π. This is the spec that makes
  * d_embed_neardup's blocking semantically meaningful instead of merely
  * oracle-mirrored.
  */
class EmbedLshRecallSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("recall at cos >= 0.9 meets the band-collision curve prediction (brute-force ground truth)") {
    // 150 random gaussian vectors + a perturbed twin each (components
    // scaled by 1 ± 0.25 on (id + j) parity → twins at cos ≈ 0.97, random
    // pairs at |cos| ≲ 0.5: a 64-dim gaussian pair sits ~7σ below 0.9)
    val rnd = new scala.util.Random(42)
    val n = 150
    val base = (0 until n).map(i => i.toLong -> Array.fill(EmbedLsh.Dim)(rnd.nextGaussian()))
    val twins = base.map { case (i, v) =>
      (i + 10000L) -> v.zipWithIndex.map { case (x, j) =>
        x * (1.0 + (if ((i + j) % 2 == 0) 0.25 else -0.25)) }
    }
    val all = (base ++ twins).toMap
    val df = (base ++ twins).map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")

    // brute-force ground truth over all pairs
    val ids = all.keys.toSeq.sorted
    val truth = for {
      ai <- ids.indices; bi <- (ai + 1) until ids.size
      c = cosine(all(ids(ai)), all(ids(bi))) if c >= EmbedLsh.Threshold
    } yield (ids(ai), ids(bi), c)
    assert(truth.size == n, "ground truth must be exactly the twin pairs")
    assert(truth.forall(_._3 >= 0.95), "twins must land well inside the tuned regime")

    val retrieved = EmbedLsh.candidatePairs(df)
      .as[(Long, Long)].collect().toSet
    val hits = truth.count { case (a, b, _) => retrieved.contains((a, b)) }
    val recall = hits.toDouble / truth.size

    // the prediction the tuning promises, averaged over the actual pair
    // cosines, minus 3σ binomial sampling slack
    val meanPred = truth.map(t => EmbedLsh.predictedRecall(t._3)).sum / truth.size
    val slack = 3.0 * math.sqrt(meanPred * (1 - meanPred) / truth.size)
    assert(recall >= meanPred - slack,
      f"recall $recall%.3f below collision-curve prediction $meanPred%.3f - 3sigma $slack%.3f")
    assert(meanPred >= 0.9, f"twins at cos>=0.95 should predict >=0.9 recall, got $meanPred%.3f")
  }
}
