package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of q_auc (queries/Relational11.auc): AUC must
  * reproduce brute-force pair counting (ties at half credit), equal the
  * (1 + δ)/2 identity against the shared cliffDelta core, hit the
  * 1 / 0.5 / 0 landmarks on separated / identical / inverted scores,
  * and yield NULL (never 0/0) on one-class samples. */
class AucSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** A collapsed (event_type, value, c1⁺, c2⁻) frame from raw scores. */
  private def g(pos: Seq[Long], neg: Seq[Long]): DataFrame = {
    val counts = (pos.map(v => (v, 1L, 0L)) ++ neg.map(v => (v, 0L, 1L)))
      .groupBy(_._1).toSeq
      .map { case (v, rs) => ("t", v.toDouble, rs.map(_._2).sum, rs.map(_._3).sum) }
    counts.toDF("event_type", "value", "c1", "c2")
  }

  private def auc(pos: Seq[Long], neg: Seq[Long]): Row =
    graft.queries.Relational11.auc(g(pos, neg)).head()

  /** Brute force: P(score⁺ > score⁻) + half the ties. */
  private def brute(pos: Seq[Long], neg: Seq[Long]): Double = {
    val gt = pos.flatMap(p => neg.map(n => p > n)).count(identity)
    val eq = pos.flatMap(p => neg.map(n => p == n)).count(identity)
    (2.0 * gt + eq) / (2.0 * pos.size * neg.size)
  }

  test("mixed scores with ties: AUC and Gini vs brute force") {
    val (p, n) = (Seq(30L, 50L, 50L, 80L, 90L), Seq(20L, 50L, 60L, 40L))
    val r = auc(p, n)
    assert(r.getLong(1) == 5L && r.getLong(2) == 4L)
    assert(r.getDouble(3) == brute(p, n), s"auc ${r.getDouble(3)}")
    assert(r.getDouble(4) == 2.0 * r.getDouble(3) - 1.0)
  }

  test("landmarks: separation 1.0, identity 0.5, inversion 0.0") {
    assert(auc(Seq(10L, 20L), Seq(1L, 2L)).getDouble(3) == 1.0)
    assert(auc(Seq(5L, 7L), Seq(5L, 7L)).getDouble(3) == 0.5)
    assert(auc(Seq(1L, 2L), Seq(10L, 20L)).getDouble(3) == 0.0)
  }

  test("identity AUC = (1 + delta)/2 against the shared cliffDelta core") {
    val (p, n) = (Seq(3L, 8L, 8L, 15L), Seq(2L, 8L, 12L))
    val a = auc(p, n).getDouble(3)
    val d = graft.queries.Relational10.cliffDelta(g(p, n)).head().getDouble(6)
    assert(math.abs(a - (1.0 + d) / 2.0) < 1e-15, s"auc $a vs (1+$d)/2")
  }

  test("one-class sample: AUC and Gini NULL, never 0/0") {
    val r = auc(Seq(1L, 2L), Seq.empty)
    assert(r.getLong(1) == 2L && r.getLong(2) == 0L)
    assert(r.isNullAt(3) && r.isNullAt(4))
  }
}
