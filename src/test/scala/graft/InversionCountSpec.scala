package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of operators/InversionCount: the four-term banded
  * decomposition of the discordant-pair count must equal brute-force pair
  * enumeration on every input shape — heavy ties on both axes, extreme
  * band counts (1 band = everything through the same-cell term; more
  * bands than values = everything coarse), monotone and anti-monotone
  * series, weighted counts, and empties. */
class InversionCountSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def v(i: Int, m: Int): Long = ((i * 2654435761L) >>> 7) % m

  private def frame(rows: Seq[(Long, Long, Long)]): DataFrame =
    rows.toDF("x", "y", "c")

  private def brute(rows: Seq[(Long, Long, Long)]): BigInt =
    (for {
      (xi, yi, ci) <- rows; (xj, yj, cj) <- rows
      if xi < xj && yi > yj
    } yield BigInt(ci) * cj).sum

  private def banded(rows: Seq[(Long, Long, Long)], bands: Int): BigInt =
    BigInt(graft.operators.InversionCount
      .discordant(frame(rows), "x", "y", "c", bands)
      .head().getDecimal(0).toBigInteger)

  /** Distinct (x, y) with deterministic counts — the operator's input
    * contract (callers collapse first). */
  private def mk(n: Int, mx: Int, my: Int): Seq[(Long, Long, Long)] =
    (0 until n).map(i => (v(i, mx), v(i + 5, my)))
      .distinct.zipWithIndex
      .map { case ((x, y), i) => (x, y, 1L + v(i, 4)) }

  test("equals brute force across band counts, heavy ties both axes") {
    val rows = mk(400, 30, 20)
    val expect = brute(rows)
    for (b <- Seq(1, 2, 7, 16, 64))
      assert(banded(rows, b) == expect, s"bands=$b")
  }

  test("monotone series: zero discordant; anti-monotone: all pairs") {
    val mono = (0 until 50).map(i => (i.toLong, i.toLong, 1L))
    assert(banded(mono, 16) == 0)
    val anti = (0 until 50).map(i => (i.toLong, 49L - i, 1L))
    assert(banded(anti, 16) == BigInt(50) * 49 / 2)
  }

  test("constant x or constant y: zero discordant") {
    assert(banded((0 until 40).map(i => (7L, i.toLong, 1L + i % 3)), 8) == 0)
    assert(banded((0 until 40).map(i => (i.toLong, 7L, 1L + i % 3)), 8) == 0)
  }

  test("weighted counts multiply: c_i * c_j, not 1") {
    val rows = Seq((1L, 5L, 3L), (2L, 2L, 4L), (3L, 9L, 2L), (4L, 1L, 5L))
    assert(banded(rows, 4) == brute(rows))
    assert(brute(rows) > 6, "weights actually matter in this sample")
  }

  test("empty and single-row inputs: zero") {
    assert(banded(Seq.empty, 16) == 0)
    assert(banded(Seq((3L, 4L, 9L)), 16) == 0)
  }
}
