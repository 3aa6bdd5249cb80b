package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of q_kendall_tau (queries/Relational11.kendallTau):
  * the pair counts must reproduce brute-force enumeration (ties in x, in
  * y, in both), τ-b must hit ±1 on perfectly monotone series, degrade to
  * NULL when a series is constant, and the single-row rollup must stay
  * well-formed on 0- and 1-point series. */
class KendallTauSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def daily(xs: Seq[(Long, Long)]): DataFrame =
    xs.zipWithIndex
      .map { case ((x, y), i) => (java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i)), x, y) }
      .toDF("day", "cents", "ords")

  private def kt(xs: (Long, Long)*): Row =
    graft.queries.Relational11.kendallTau(daily(xs)).head()

  /** Brute-force pair enumeration — the oracle the distributed pair join
    * must equal. Returns (n_pairs, conc, disc, tie_x, tie_y, tau_b). */
  private def brute(xs: Seq[(Long, Long)]) = {
    val pairs = for {
      i <- xs.indices; j <- xs.indices if i < j
    } yield (java.lang.Long.signum(xs(j)._1 - xs(i)._1),
      java.lang.Long.signum(xs(j)._2 - xs(i)._2))
    val n0 = pairs.size.toLong
    val conc = pairs.count { case (a, b) => a * b == 1 }.toLong
    val disc = pairs.count { case (a, b) => a * b == -1 }.toLong
    val tx = pairs.count(_._1 == 0).toLong
    val ty = pairs.count(_._2 == 0).toLong
    val den = (n0 - tx).toDouble * (n0 - ty)
    (n0, conc, disc, tx, ty,
      if (den > 0) Some((conc - disc).toDouble / math.sqrt(den)) else None)
  }

  test("mixed series with all three tie kinds: counts and tau vs brute") {
    val xs = Seq((10L, 1L), (20L, 3L), (20L, 2L), (30L, 3L), (25L, 3L), (25L, 5L))
    val (n0, c, d, tx, ty, tau) = brute(xs)
    val r = kt(xs: _*)
    assert(r.getLong(1) == n0 && r.getLong(2) == c && r.getLong(3) == d)
    assert(r.getLong(4) == tx && r.getLong(5) == ty)
    assert(math.abs(r.getDouble(6) - tau.get) < 1e-15,
      s"tau ${r.getDouble(6)} vs ${tau.get}")
  }

  test("perfect concordance / discordance: tau ±1") {
    assert(kt((1L, 1L), (2L, 2L), (3L, 3L)).getDouble(6) == 1.0)
    assert(kt((1L, 3L), (2L, 2L), (3L, 1L)).getDouble(6) == -1.0)
  }

  test("constant x series: denominator zero -> tau NULL, ties counted") {
    val r = kt((5L, 1L), (5L, 2L), (5L, 3L))
    assert(r.getLong(4) == 3L, "all pairs tied in x")
    assert(r.isNullAt(6))
  }

  test("single point and empty series: 0 pairs, NULL tau") {
    val one = kt((5L, 1L))
    assert(one.getLong(0) == 1L && one.getLong(1) == 0L && one.isNullAt(6))
    val empty = graft.queries.Relational11.kendallTau(
      daily(Seq.empty)).head()
    assert(empty.getLong(0) == 0L && empty.getLong(1) == 0L && empty.isNullAt(6))
  }

  test("sign identity vs theilSen direction on a strict trend") {
    // a strictly increasing revenue series: tau = +1 and the Theil–Sen
    // slope must be positive — the two gates read the same geometry
    val xs = (0 until 8).map(i => (100L + 7L * i, 1L + i.toLong))
    assert(kt(xs: _*).getDouble(6) == 1.0)
    val slope = graft.queries.Relational10.theilSen(
      daily(xs).selectExpr("day", "cents")).head().getDouble(1)
    assert(slope > 0.0)
  }
}
