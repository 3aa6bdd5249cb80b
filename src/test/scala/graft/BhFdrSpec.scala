package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Relational11

/** BH step-up core (Relational11.bhFdr — the q_bh_fdr gate): the gate's
  * hash-random split correctly never rejects, so the decision logic
  * lives here on planted (n_perm, n_exceed) panels — including the
  * defining STEP-UP property (a rank is rejected because a LATER rank
  * passes, even when its own threshold fails).
  */
class BhFdrSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Plant exceedance counts k_i at R = 59 (p_i = (k_i+1)/60); at
    * α = 1/20 the integer condition is 20·m·(k+1) ≤ i·60. */
  private def run(ks: Seq[Long]): Seq[(String, Long, Boolean)] =
    Relational11.bhFdr(
      ks.zipWithIndex.map { case (k, i) =>
        (s"t$i", 59L, k, (k + 1).toDouble / 60.0)
      }.toDF("event_type", "n_perm", "n_exceed", "p_value"))
      .selectExpr("event_type", "rnk", "rejected")
      .as[(String, Long, Boolean)].collect().toSeq.sortBy(_._1)

  test("step-up: an early rank rejects BECAUSE a later rank passes, even though its own threshold fails") {
    // m=3: rank i rejects iff k+1 <= i. k=(1,1,50): rank 1 (k=1) fails
    // its own 1-threshold, rank 2 (k=1) passes 2 -> i_max=2 rejects BOTH.
    val got = run(Seq(1L, 1L, 50L))
    assert(got.count(_._3) == 2, "step-up must reject ranks 1 AND 2")
    assert(!got.find(_._2 == 3L).get._3, "the large-p rank stays accepted")
  }

  test("plain rejection ladder and the monotone cutoff") {
    // k=(0,1,50): ranks 1,2 pass their own thresholds, rank 3 fails
    val got = run(Seq(0L, 1L, 50L))
    assert(got.filter(_._3).map(_._2).sorted == Seq(1L, 2L),
      "rejections are exactly the ranks at or below i_max")
  }

  test("no rank passes: zero rejections (the gate's real-data shape)") {
    val got = run(Seq(10L, 20L, 30L))
    assert(got.forall(!_._3))
  }

  test("all pass: everything rejected; ties order deterministically by event_type") {
    // m=3, all k=0: i=1 needs k+1 <= 1 (pass) -> i_max=3 rejects all;
    // equal p's rank by the event_type tiebreak
    val got = run(Seq(0L, 0L, 0L))
    assert(got.forall(_._3))
    assert(got.sortBy(_._1).map(_._2) == Seq(1L, 2L, 3L),
      "tied p-values take deterministic ranks in event_type order")
  }

  test("resolution guard at m=4, R=59: a lone minimal p cannot clear alpha/m, but four tied minima step-up together") {
    // rank-1 threshold alpha/m = 1/80 < 1/60 = the smallest representable
    // p, so ONE strong result alone can never reject at m=4...
    val lone = run(Seq(0L, 50L, 50L, 50L))
    assert(lone.forall(!_._3),
      "a single minimal p is below the permutation resolution at m=4")
    // ...but four tied minima DO reject: rank 4's threshold is alpha and
    // the step-up pulls ranks 1-3 along — the defining BH asymmetry
    val tied = run(Seq(0L, 0L, 0L, 0L))
    assert(tied.forall(_._3),
      "tied minima clear the rank-m threshold together via step-up")
  }
}
