package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of q_kruskal_wallis (queries/Relational11
  * .kruskalWallis): H and the tie-corrected H_adj must reproduce an
  * independent midrank-based brute force on planted samples (ties, an
  * empty group, all-equal values), and the k=2 cross-gate identity must
  * hold: with one group empty, tie-corrected H equals the SQUARE of
  * q_mann_whitney's tie-corrected z on the same collapsed frame. */
class KruskalWallisSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** A collapsed (event_type, value, c0, c1, c2, cnt) frame from raw
    * per-group samples. */
  private def g(groups: Seq[Double]*): DataFrame = {
    require(groups.size == 3)
    val rows = groups.zipWithIndex.flatMap { case (xs, k) => xs.map((_, k)) }
      .groupBy(_._1).toSeq
      .map { case (v, rs) =>
        val c = (0 to 2).map(k => rs.count(_._2 == k).toLong)
        ("t", v, c(0), c(1), c(2), c.sum)
      }
    rows.toDF("event_type", "value", "c0", "c1", "c2", "cnt")
  }

  private def kw(groups: Seq[Double]*): Row =
    graft.queries.Relational11.kruskalWallis(g(groups: _*)).head()

  /** Independent brute force: midranks by sort, classic H, tie factor. */
  private def brute(groups: Seq[Double]*): (Double, Option[Double]) = {
    val all = groups.zipWithIndex.flatMap { case (xs, k) => xs.map((_, k)) }
    val n = all.size
    val midrank = all.map(_._1).sorted.zipWithIndex
      .groupBy(_._1).map { case (v, rs) =>
        v -> rs.map(_._2 + 1).sum.toDouble / rs.size }
    val sumTerm = groups.filter(_.nonEmpty).map { xs =>
      val r = xs.map(midrank).sum
      r * r / xs.size
    }.sum
    val h = 12.0 / (n * (n + 1)) * sumTerm - 3.0 * (n + 1)
    val tt = all.map(_._1).groupBy(identity).values
      .map(t => t.size.toLong * t.size * t.size - t.size).sum
    val c = 1.0 - tt.toDouble / (n.toLong * n * n - n)
    (h, if (c > 0.0) Some(h / c) else None)
  }

  test("no ties: hand value 7.2, h == h_adj") {
    val r = kw(Seq(1d, 2d, 3d), Seq(4d, 5d, 6d), Seq(7d, 8d, 9d))
    assert(math.abs(r.getDouble(7) - 7.2) < 1e-12, s"h ${r.getDouble(7)}")
    assert(r.getDouble(8) == r.getDouble(7), "no ties: correction is 1")
  }

  test("heavy ties: matches the midrank brute force") {
    val (a, b, c) = (Seq(1d, 2d, 2d, 3d, 5d), Seq(2d, 3d, 3d, 4d), Seq(3d, 5d, 5d))
    val (bh, bha) = brute(a, b, c)
    val r = kw(a, b, c)
    assert(math.abs(r.getDouble(7) - bh) < 1e-9, s"h ${r.getDouble(7)} vs $bh")
    assert(math.abs(r.getDouble(8) - bha.get) < 1e-9,
      s"h_adj ${r.getDouble(8)} vs ${bha.get}")
  }

  test("empty third group: k degrades to 2, matches brute force") {
    val (a, b) = (Seq(1d, 4d, 4d, 7d), Seq(2d, 4d, 6d))
    val (bh, bha) = brute(a, b, Seq.empty)
    val r = kw(a, b, Seq.empty)
    assert(r.getLong(3) == 0L)
    assert(math.abs(r.getDouble(7) - bh) < 1e-9)
    assert(math.abs(r.getDouble(8) - bha.get) < 1e-9)
  }

  test("all values equal: h = 0, tie correction degenerate -> h_adj NULL") {
    val r = kw(Seq(5d, 5d), Seq(5d, 5d, 5d), Seq(5d))
    assert(math.abs(r.getDouble(7)) < 1e-12, s"h ${r.getDouble(7)}")
    assert(r.isNullAt(8), "c = 0 must yield NULL h_adj")
  }

  test("k=2 cross-gate identity: h_adj = z^2 against mannWhitney") {
    val (x, y) = (Seq(1d, 2d, 2d, 4d, 7d, 9d), Seq(2d, 3d, 5d, 5d, 8d))
    val hAdj = kw(x, y, Seq.empty).getDouble(8)
    // mannWhitney consumes (event_type, value, c1, c2, cnt) with variant-0
    // counts in c1 — map this spec's group 0 -> c1, group 1 -> c2
    val mwFrame = g(x, y, Seq.empty)
      .selectExpr("event_type", "value", "c0 AS c1", "c1 AS c2", "cnt")
    val z = graft.queries.Relational9.mannWhitney(mwFrame).head().getDouble(4)
    assert(math.abs(hAdj - z * z) < 1e-9, s"h_adj $hAdj vs z^2 ${z * z}")
  }
}
