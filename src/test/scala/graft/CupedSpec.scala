package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of q_cuped (queries/Relational11.cuped): θ must
  * equal the pooled cov/var slope re-derived with BigInt integer moments,
  * a perfectly linear covariate must remove ALL metric variance (and the
  * adjusted diff collapse to ~0), an uninformative covariate must leave
  * the raw diff untouched, and the degenerate guards must yield NULL. */
class CupedSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** A per-user (event_type, variant, x, y) frame. */
  private def u(rows: Seq[(Long, Long, Long)]): DataFrame =
    rows.map { case (v, x, y) => ("t", v, x, y) }
      .toDF("event_type", "variant", "x", "y")

  private def cu(rows: (Long, Long, Long)*): Row =
    graft.queries.Relational11.cuped(u(rows)).head()

  /** BigInt replay of the θ integer core. */
  private def bruteTheta(rows: Seq[(Long, Long, Long)]): Option[Double] = {
    val n = BigInt(rows.size)
    val sx = rows.map(r => BigInt(r._2)).sum
    val sy = rows.map(r => BigInt(r._3)).sum
    val sxy = rows.map(r => BigInt(r._2) * r._3).sum
    val sxx = rows.map(r => BigInt(r._2) * r._2).sum
    val den = n * sxx - sx * sx
    if (den > 0) Some((n * sxy - sx * sy).toDouble / den.toDouble) else None
  }

  test("theta matches the BigInt pooled cov/var replay") {
    val rows = Seq((0L, 10L, 25L), (0L, 20L, 41L), (1L, 15L, 33L),
      (1L, 30L, 58L), (0L, 25L, 52L), (1L, 5L, 14L))
    assert(cu(rows: _*).getDouble(3) == bruteTheta(rows).get)
  }

  test("perfectly linear covariate: var_reduction 1, adjusted diff ~0") {
    // y = 3x exactly — the baseline explains everything, so CUPED must
    // strip the (large) raw diff down to ~0
    val rows = Seq((0L, 10L, 30L), (0L, 20L, 60L), (1L, 100L, 300L),
      (1L, 200L, 600L), (0L, 15L, 45L), (1L, 150L, 450L))
    val r = cu(rows: _*)
    assert(math.abs(r.getDouble(6) - 1.0) < 1e-12, s"var_red ${r.getDouble(6)}")
    assert(math.abs(r.getDouble(4)) > 1e-4, "raw diff is large")
    assert(math.abs(r.getDouble(5)) < 1e-9, s"cuped diff ${r.getDouble(5)}")
  }

  test("uncorrelated covariate: theta 0, var_reduction 0, cuped diff = raw") {
    // constructed exact zero covariance: n·Σxy = Σx·Σy (144 = 144)
    val rows = Seq((0L, 1L, 5L), (0L, 2L, 5L), (1L, 1L, 7L), (1L, 2L, 7L))
    val r = cu(rows: _*)
    assert(r.getDouble(3) == 0.0 && r.getDouble(6) == 0.0)
    assert(r.getDouble(5) == r.getDouble(4), "theta=0 adjustment is exact")
  }

  test("constant covariate: theta/adjustment NULL, raw diff survives") {
    val r = cu((0L, 5L, 10L), (0L, 5L, 20L), (1L, 5L, 30L), (1L, 5L, 40L))
    assert(r.isNullAt(3) && r.isNullAt(5) && r.isNullAt(6))
    // the gate's exact chain: (Σy1/n1)/1e6 − (Σy0/n0)/1e6
    assert(r.getDouble(4) == 70.0 / 2.0 / 1e6 - 30.0 / 2.0 / 1e6)
  }

  test("constant metric: rho^2 undefined -> var_reduction NULL (never 0/0)") {
    val r = cu((0L, 10L, 7L), (0L, 20L, 7L), (1L, 15L, 7L), (1L, 30L, 7L))
    assert(r.getDouble(3) == 0.0, "theta is 0: num_th = 0, den_th > 0")
    assert(r.isNullAt(6), "den_y = 0: rho^2 has no meaning")
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0)
  }

  test("one-sided variant: diffs NULL, theta still estimated") {
    val r = cu((0L, 1L, 2L), (0L, 2L, 4L), (0L, 3L, 7L))
    assert(r.getLong(2) == 0L)
    assert(!r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
  }
}
