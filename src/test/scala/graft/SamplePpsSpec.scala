package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Text2

/** Systematic-PPS sampling core (Text2.ppsHits — the t_sample_pps gate):
  * brute-force grid equality, the k/k+1 draw-count law, whale-doc
  * multiplicity, zero-weight exclusion, and partition-layout invariance
  * (the draw must be a pure function of the weight frame, never of the
  * cluster shape).
  */
class SamplePpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def run(ws: Seq[(Long, Long)], k: Int, parts: Int): Seq[(Long, Long, Long, Long)] =
    Text2.ppsHits(ws.toDF("doc_id", "w_bytes").repartition(parts), k)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq

  /** The definition, literally: grid points anchor + j·step over the
    * cumulative byte axis; a doc is drawn once per point in its span. */
  private def brute(ws: Seq[(Long, Long)], k: Int): Seq[(Long, Long, Long, Long)] = {
    val sorted = ws.sortBy(_._1)
    val total = ws.map(_._2).sum
    val step = total / k
    if (step == 0) return Seq.empty
    val anchor = step / 2
    val grid = Iterator.from(0).map(j => anchor + j.toLong * step)
      .takeWhile(_ < total).toSeq
    var cum = 0L
    sorted.flatMap { case (id, w) =>
      val lo = cum; cum += w
      val h = grid.count(p => p >= lo && p < cum)
      if (h > 0) Some((id, w, cum, h.toLong)) else None
    }
  }

  private val mixed: Seq[(Long, Long)] =
    (0 until 200).map(i => (i.toLong, 1L + ((i * 2654435761L) >>> 7) % 97))

  test("pps: matches the brute grid scan; total draws are k or k+1") {
    for (k <- Seq(1, 7, 20, 50)) {
      val got = run(mixed, k, 8)
      assert(got == brute(mixed, k), s"k=$k")
      val draws = got.map(_._4).sum
      assert(draws == k || draws == k + 1,
        s"k=$k: systematic grid must yield k or k+1 draws, got $draws")
    }
  }

  test("pps: a whale doc heavier than step is drawn multiple times; zero-weight docs never") {
    val ws = Seq((1L, 10L), (2L, 0L), (3L, 500L), (4L, 10L), (5L, 0L), (6L, 80L))
    val got = run(ws, 10, 4) // step = 60: the 500-byte whale spans >8 grid points
    assert(got == brute(ws, 10))
    assert(got.find(_._1 == 3L).exists(_._4 >= 8L), "whale must be drawn repeatedly")
    assert(!got.exists(r => r._1 == 2L || r._1 == 5L), "zero-weight docs can never be hit")
  }

  test("pps: partition-layout invariance and the W < k degenerate (step 0 -> empty draw)") {
    assert(run(mixed, 20, 1) == run(mixed, 20, 13),
      "the draw is a function of the frame, not the partitioning")
    assert(run(Seq((1L, 3L), (2L, 4L)), 20, 2).isEmpty,
      "total below k: integer step is 0, the gate declines rather than div-zero")
  }
}
