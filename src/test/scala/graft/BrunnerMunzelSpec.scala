package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of q_brunner_munzel (queries/Relational10
  * .brunnerMunzel): the generalized-Wilcoxon statistic, stochastic-
  * superiority estimate p̂ and Welch df must reproduce hand-computed
  * values on tiny samples — including midrank ties, the degenerate
  * zero-variance (complete-separation) case, and the one-sided-sample
  * case — because the gate's exact-integer decomposition
  * (S_k² = (n_k·B_k − A_k²)/(4·n_k·(n_k−1)) from half-unit midranks)
  * is far from the textbook formula it must equal. */
class BrunnerMunzelSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** A collapsed (event_type, value, c1, c2) frame from raw samples. */
  private def g(x: Seq[Double], y: Seq[Double]): DataFrame = {
    val counts = (x.map(v => (v, 1L, 0L)) ++ y.map(v => (v, 0L, 1L)))
      .groupBy(_._1).toSeq
      .map { case (v, rs) => ("t", v, rs.map(_._2).sum, rs.map(_._3).sum) }
    counts.toDF("event_type", "value", "c1", "c2")
  }

  private def bm(x: Seq[Double], y: Seq[Double]): Row =
    graft.queries.Relational10.brunnerMunzel(g(x, y)).head()

  test("tie-free interleaved samples reproduce the textbook statistic") {
    // x=[1,3], y=[2,4]: m1=2, m2=3, v1=v2=0.5 (hand-computed deviations
    // ±0.5), W = 4·1/(4·√2) = 1/√2, p̂ = 0.75, df = 2
    val r = bm(Seq(1d, 3d), Seq(2d, 4d))
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 0.75, s"p_hat ${r.getDouble(3)}")
    assert(math.abs(r.getDouble(4) - 1.0 / math.sqrt(2.0)) < 1e-12, s"w_bm ${r.getDouble(4)}")
    assert(math.abs(r.getDouble(5) - 2.0) < 1e-12, s"df ${r.getDouble(5)}")
  }

  test("midrank ties: the shared value splits its placement exactly") {
    // x=[1,2], y=[2,3]: pooled midranks 1, 2.5, 2.5, 4 → m1=1.75,
    // m2=3.25, v1=v2=0.125, W = 4·1.5/(4·√0.5) = 1.5/√0.5, p̂ = 0.875
    val r = bm(Seq(1d, 2d), Seq(2d, 3d))
    assert(r.getDouble(3) == 0.875, s"p_hat ${r.getDouble(3)}")
    assert(math.abs(r.getDouble(4) - 1.5 / math.sqrt(0.5)) < 1e-12, s"w_bm ${r.getDouble(4)}")
  }

  test("complete separation: zero within-variance, W and df NULL, p̂ = 1") {
    val r = bm(Seq(1d, 2d), Seq(3d, 4d))
    assert(r.getDouble(3) == 1.0, s"p_hat ${r.getDouble(3)}")
    assert(r.isNullAt(4) && r.isNullAt(5), "w_bm/df must be NULL at zero variance")
  }

  test("one-sided sample: every float output NULL, counts intact") {
    val r = bm(Seq(1d, 2d, 3d), Seq.empty)
    assert(r.getLong(1) == 3L && r.getLong(2) == 0L)
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
  }

  test("symmetry: swapping the samples negates W and reflects p̂") {
    val a = bm(Seq(1d, 3d, 5d), Seq(2d, 4d, 6d))
    val b = bm(Seq(2d, 4d, 6d), Seq(1d, 3d, 5d))
    assert(a.getDouble(4) == -b.getDouble(4), s"${a.getDouble(4)} vs ${b.getDouble(4)}")
    assert(math.abs((a.getDouble(3) + b.getDouble(3)) - 1.0) < 1e-12)
    assert(a.getDouble(5) == b.getDouble(5), "df is sample-order symmetric here (equal n)")
  }
}
