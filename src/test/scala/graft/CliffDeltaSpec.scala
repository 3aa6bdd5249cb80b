package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of q_cliff_delta (queries/Relational10.cliffDelta):
  * the pair counts and δ must reproduce hand-enumerated values on tiny
  * samples — ties, complete separation, one-sided samples — and two
  * structural identities must hold on every input: the pair-count
  * identity n_gt + n_lt + n_ties = n1·n2 (the gate derives n_lt FROM it,
  * so the spec re-derives n_gt+n_ties independently from raw pairs), and
  * the cross-gate identity δ = 1 − 2·p̂ against q_brunner_munzel's
  * stochastic-superiority estimate on the SAME collapsed frame. */
class CliffDeltaSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** A collapsed (event_type, value, c1, c2) frame from raw samples. */
  private def g(x: Seq[Double], y: Seq[Double]): DataFrame = {
    val counts = (x.map(v => (v, 1L, 0L)) ++ y.map(v => (v, 0L, 1L)))
      .groupBy(_._1).toSeq
      .map { case (v, rs) => ("t", v, rs.map(_._2).sum, rs.map(_._3).sum) }
    counts.toDF("event_type", "value", "c1", "c2")
  }

  private def cd(x: Seq[Double], y: Seq[Double]): Row =
    graft.queries.Relational10.cliffDelta(g(x, y)).head()

  /** Brute-force pair enumeration — the oracle the distributed
    * decomposition must equal. */
  private def brute(x: Seq[Double], y: Seq[Double]): (Long, Long, Long) = (
    x.flatMap(a => y.map(b => a > b)).count(identity).toLong,
    x.flatMap(a => y.map(b => a < b)).count(identity).toLong,
    x.flatMap(a => y.map(b => a == b)).count(identity).toLong)

  test("hand-enumerated pairs with a tie: counts, delta, magnitude") {
    // x=[1,2,3], y=[2,4]: gt=1 (3>2), lt=4, ties=1, δ=(1−4)/6=−0.5, large
    val r = cd(Seq(1d, 2d, 3d), Seq(2d, 4d))
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 1L, s"n_gt ${r.getLong(3)}")
    assert(r.getLong(4) == 4L, s"n_lt ${r.getLong(4)}")
    assert(r.getLong(5) == 1L, s"n_ties ${r.getLong(5)}")
    assert(r.getDouble(6) == -0.5, s"delta ${r.getDouble(6)}")
    assert(r.getString(7) == "large")
  }

  test("identical samples: delta 0, magnitude negligible") {
    val r = cd(Seq(1d, 2d, 3d), Seq(1d, 2d, 3d))
    assert(r.getDouble(6) == 0.0)
    assert(r.getString(7) == "negligible")
  }

  test("complete separation: delta ±1") {
    assert(cd(Seq(3d, 4d), Seq(1d, 2d)).getDouble(6) == 1.0)
    assert(cd(Seq(1d, 2d), Seq(3d, 4d)).getDouble(6) == -1.0)
  }

  test("one-sided sample: counts intact, delta and magnitude NULL") {
    val r = cd(Seq(1d, 2d), Seq.empty)
    assert(r.getLong(1) == 2L && r.getLong(2) == 0L)
    assert(r.isNullAt(6) && r.isNullAt(7))
  }

  test("pair-count identity vs brute-force enumeration (heavy midrank ties)") {
    val x = Seq(1d, 2d, 2d, 3d, 5d, 5d, 5d, 8d)
    val y = Seq(2d, 2d, 4d, 5d, 5d, 9d)
    val (bg, bl, bt) = brute(x, y)
    val r = cd(x, y)
    assert(r.getLong(3) == bg, s"n_gt ${r.getLong(3)} vs $bg")
    assert(r.getLong(4) == bl, s"n_lt ${r.getLong(4)} vs $bl")
    assert(r.getLong(5) == bt, s"n_ties ${r.getLong(5)} vs $bt")
    assert(r.getDouble(6) == (bg - bl).toDouble / (x.size * y.size))
  }

  test("cross-gate identity: delta = 1 - 2*p_hat against brunnerMunzel") {
    val x = Seq(1d, 2d, 2d, 4d, 7d)
    val y = Seq(2d, 3d, 5d, 5d)
    val d = cd(x, y).getDouble(6)
    val p = graft.queries.Relational10.brunnerMunzel(g(x, y)).head().getDouble(3)
    assert(math.abs(d - (1.0 - 2.0 * p)) < 1e-12, s"delta $d vs 1-2*$p")
  }
}
