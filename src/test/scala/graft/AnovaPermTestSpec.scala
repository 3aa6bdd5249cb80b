package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of q_anova and q_perm_test (queries/Relational11):
  * ANOVA's F must reproduce a mean-based brute force and behave at the
  * degenerate edges; the permutation test's exceedance set must reproduce
  * a plain-JVM replay of the md5 assignment with BigInt cross-multiplied
  * comparisons (the gate's no-float-decides contract re-derived
  * independently), and its p-value must hit the exact all-tied ceiling. */
class AnovaPermTestSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // -------------------------------------------------------------- anova

  private def evA(g0: Seq[Long], g1: Seq[Long], g2: Seq[Long]): DataFrame =
    (g0.map(("t", 0L, _)) ++ g1.map(("t", 1L, _)) ++ g2.map(("t", 2L, _)))
      .toDF("event_type", "variant", "x6")

  private def anova(g0: Seq[Long], g1: Seq[Long], g2: Seq[Long]): Row =
    graft.queries.Relational11.anova(evA(g0, g1, g2)).head()

  /** Textbook brute force via group means (different summation order). */
  private def bruteF(gs: Seq[Seq[Long]]): Option[Double] = {
    if (gs.exists(_.isEmpty) || gs.map(_.size).sum <= 3) return None
    val n = gs.map(_.size).sum
    val grand = gs.flatten.map(_.toDouble).sum / n
    val between = gs.map(g => g.size *
      math.pow(g.map(_.toDouble).sum / g.size - grand, 2)).sum
    val within = gs.map(g => { val m = g.map(_.toDouble).sum / g.size
      g.map(x => math.pow(x - m, 2)).sum }).sum
    if (within > 0) Some((n - 3) / 2.0 * between / within) else None
  }

  test("anova: separated groups match the mean-based brute force") {
    val gs = Seq(Seq(1L, 2L, 3L), Seq(11L, 13L, 12L, 14L), Seq(25L, 24L))
    val expect = bruteF(gs).get
    val r = anova(gs(0), gs(1), gs(2))
    assert(math.abs(r.getDouble(7) - expect) < 1e-9 * expect,
      s"f ${r.getDouble(7)} vs $expect")
    assert(r.getDouble(4) == 2.0 / 1e6 && r.getDouble(6) == 24.5 / 1e6)
  }

  test("anova: equal means across groups -> F near zero") {
    val r = anova(Seq(10L, 20L, 30L), Seq(15L, 25L), Seq(10L, 30L))
    assert(math.abs(r.getDouble(7)) < 1e-12, s"f ${r.getDouble(7)}")
  }

  test("anova: degenerate inputs yield NULL, never NaN/Infinity") {
    assert(anova(Seq(1L, 2L), Seq(3L), Seq.empty).isNullAt(7), "empty group")
    assert(anova(Seq(1L), Seq(2L), Seq(3L)).isNullAt(7), "N <= 3")
    assert(anova(Seq(5L, 5L), Seq(5L), Seq(5L)).isNullAt(7), "zero within")
  }

  test("anova: global location shift leaves F unchanged (within float slack)") {
    // the integer sums are exact, but a large shift inflates ΣR²/n and
    // G²/N before their near-cancelling subtraction — the between-SS
    // lands on different low bits (the q_moments cancellation class), so
    // the invariance holds to relative precision, not bitwise; CROSS-
    // ENGINE parity is unaffected (both engines run the identical chain)
    val gs = Seq(Seq(3L, 9L, 4L), Seq(12L, 7L), Seq(1L, 8L, 15L))
    val base = anova(gs(0), gs(1), gs(2)).getDouble(7)
    val shifted = anova(gs(0).map(_ + 10000L), gs(1).map(_ + 10000L),
      gs(2).map(_ + 10000L)).getDouble(7)
    assert(math.abs(base - shifted) < 1e-6 * base, s"$base vs $shifted")
  }

  // ---------------------------------------------------------- perm test

  private def evP(xs: Seq[(Long, Long)]): DataFrame =
    xs.map { case (u, x) => ("t", u, x) }.toDF("event_type", "user_id", "x6")

  private def pt(xs: Seq[(Long, Long)], r: Int): Row =
    graft.queries.Relational11.permTest(evP(xs), r).head()

  /** Plain-JVM replay of the md5-bit split: the first 15 hex chars of
    * md5(user) as a 60-bit long, permutation r = bit r — the gate's
    * shiftright(h, r) % 2, and bit 0 the family's observed h % 2 split. */
  private def variant(u: Long, r: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$u".getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) >> r) & 1L
  }

  /** Independent exceedance replay with BigInt cross-multiplication. */
  private def brutePt(xs: Seq[(Long, Long)], r: Int): (Long, Double) = {
    def stat(salt: Long): (BigInt, BigInt) = { // (|S0·n1 − S1·n0|, n0·n1)
      val (g0, g1) = xs.partition { case (u, _) => variant(u, salt) == 0 }
      val (s0, s1) = (BigInt(g0.map(_._2).sum), BigInt(g1.map(_._2).sum))
      ((s0 * g1.size - s1 * g0.size).abs, BigInt(g0.size) * g1.size)
    }
    val (aO, dO) = stat(0)
    val exceed = (1 to r).count { salt =>
      val (aR, dR) = stat(salt)
      dR == 0 || aR * dO >= aO * dR // one-sided split: conservative exceed
    }.toLong
    (exceed, (exceed + 1).toDouble / (r + 1).toDouble)
  }

  test("perm test: exceedance count and p-value match the JVM md5 replay") {
    // users with a real split effect so the exceedance set is non-trivial
    val xs = Seq(1L -> 100L, 2L -> 900L, 3L -> 150L, 4L -> 880L,
      5L -> 120L, 6L -> 910L, 7L -> 90L, 8L -> 870L, 9L -> 130L)
    val r = 16
    val (exceed, p) = brutePt(xs, r)
    val row = pt(xs, r)
    assert(row.getLong(4) == r.toLong, s"n_perm ${row.getLong(4)}")
    assert(row.getLong(5) == exceed, s"n_exceed ${row.getLong(5)} vs $exceed")
    assert(row.getDouble(6) == p, s"p ${row.getDouble(6)} vs $p")
  }

  test("perm test: constant values -> every permutation ties, p = 1") {
    val xs = (1L to 8L).map(_ -> 42L)
    val row = pt(xs, 8)
    assert(row.getLong(5) == 8L && row.getDouble(6) == 1.0)
    assert(math.abs(row.getDouble(3)) < 1e-12, "mean diff 0")
  }

  test("perm test: p is never below the 1/(R+1) resolution floor") {
    // extreme separation: observed stat should beat most permutations
    val xs = Seq(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1000000L,
      5L -> 1000000L, 6L -> 1000000L)
    val row = pt(xs, 32)
    assert(row.getDouble(6) >= 1.0 / 33.0 && row.getDouble(6) <= 1.0)
  }
}
