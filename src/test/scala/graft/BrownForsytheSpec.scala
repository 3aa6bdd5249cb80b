package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of q_brown_forsythe (queries/Relational11
  * .brownForsythe): the F statistic must reproduce an independent
  * mean-based brute force on planted micro samples, the group median must
  * be the lower PERCENTILE_DISC data value, F must be invariant under a
  * per-group location shift (the median-centering property that makes BF
  * a pure SPREAD test), and the degenerate guards (empty group, zero
  * within-variance, N ≤ 2) must yield NULL, never NaN/Infinity. */
class BrownForsytheSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** An (event_type, variant, x6) frame from raw per-group micro samples. */
  private def ev(g0: Seq[Long], g1: Seq[Long]): DataFrame =
    (g0.map(("t", 0L, _)) ++ g1.map(("t", 1L, _)))
      .toDF("event_type", "variant", "x6")

  private def bf(g0: Seq[Long], g1: Seq[Long]): Row =
    graft.queries.Relational11.brownForsythe(ev(g0, g1)).head()

  /** Lower discrete median: smallest value with cume_dist >= 1/2 —
    * PERCENTILE_DISC(0.5) in both engines. */
  private def medDisc(xs: Seq[Long]): Long =
    xs.sorted.apply(math.ceil(xs.size / 2.0).toInt - 1)

  /** Independent brute force via group means of |x − med| (the textbook
    * one-way ANOVA form, a different summation order than the gate's
    * exact-sum assembly). */
  private def brute(g0: Seq[Long], g1: Seq[Long]): Option[Double] = {
    if (g0.isEmpty || g1.isEmpty || g0.size + g1.size <= 2) return None
    val zs = Seq(g0, g1).map { g =>
      val m = medDisc(g); g.map(x => math.abs(x - m).toDouble) }
    val n = zs.map(_.size).sum
    val grand = zs.flatten.sum / n
    val between = zs.map(z => z.size * math.pow(z.sum / z.size - grand, 2)).sum
    val within = zs.map(z => { val m = z.sum / z.size
      z.map(x => math.pow(x - m, 2)).sum }).sum
    if (within > 0) Some((n - 2) * between / within) else None
  }

  test("spread shift: planted wide group vs narrow group, F vs brute") {
    val g0 = Seq(100L, 101L, 102L, 103L, 104L) // tight
    val g1 = Seq(0L, 50L, 100L, 150L, 200L)    // wide, same median
    val r = bf(g0, g1)
    assert(r.getLong(3) == medDisc(g0) && r.getLong(4) == medDisc(g1))
    val expect = brute(g0, g1).get
    assert(math.abs(r.getDouble(5) - expect) < 1e-9 * expect,
      s"f ${r.getDouble(5)} vs $expect")
  }

  test("even group size: median is the LOWER middle value") {
    val r = bf(Seq(1L, 2L, 3L, 4L), Seq(10L, 20L))
    assert(r.getLong(3) == 2L, "percentile_disc(0.5) of [1,2,3,4] is 2")
    assert(r.getLong(4) == 10L)
  }

  test("per-group location shift leaves F unchanged (pure spread test)") {
    val g0 = Seq(5L, 9L, 14L, 20L, 31L)
    val g1 = Seq(1L, 2L, 4L, 8L, 16L, 32L)
    val base = bf(g0, g1).getDouble(5)
    val shifted = bf(g0.map(_ + 1000000L), g1.map(_ - 777L)).getDouble(5)
    assert(base == shifted, s"$base vs $shifted — deviations are exact integers")
  }

  test("degenerate inputs: NULL f, never NaN/Infinity") {
    assert(bf(Seq(1L, 2L, 3L), Seq.empty).isNullAt(5), "empty group")
    assert(bf(Seq(1L), Seq(2L)).isNullAt(5), "N <= 2")
    assert(bf(Seq(1L, 1L, 1L), Seq(5L, 5L)).isNullAt(5), "zero within-spread")
  }

  test("equal spreads around different medians: F near zero") {
    val r = bf(Seq(10L, 20L, 30L), Seq(1010L, 1020L, 1030L))
    assert(math.abs(r.getDouble(5)) < 1e-12, s"f ${r.getDouble(5)}")
  }
}
