package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite

/** Partition-order invariance of the experiment-family cores: the whole
  * SURVEY §6 exact-integer discipline exists so that a gate's output is a
  * pure function of the DATA, not of how Spark happened to partition it.
  * This spec enforces that claim mechanically — every factored core runs
  * on a 1-partition and a 13-partition layout of the SAME ~600-row
  * synthetic frame and must produce BITWISE-identical rows (doubles
  * compared by raw IEEE bits, so a summation-order leak that lands on
  * different low bits cannot hide behind a tolerance). A float aggregate
  * over rows (the forbidden shape) would fail here nondeterministically;
  * exact integer aggregates + one pinned chain per output cannot. */
class ExperimentDeterminismSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Deterministic pseudo-values from an index (no RNG state). */
  private def v(i: Int, m: Int): Long = ((i * 2654435761L) >>> 7) % m

  private def bitIdentical(a: Seq[Row], b: Seq[Row]): Unit = {
    assert(a.size == b.size, s"row counts ${a.size} vs ${b.size}")
    a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
      assert(x.size == y.size)
      (0 until x.size).foreach { j =>
        val (xv, yv) = (x.get(j), y.get(j))
        (xv, yv) match {
          case (null, null) => ()
          case (d1: java.lang.Double, d2: java.lang.Double) =>
            assert(java.lang.Double.doubleToRawLongBits(d1)
              == java.lang.Double.doubleToRawLongBits(d2),
              s"row $i col $j: $d1 vs $d2 differ in raw bits")
          case _ => assert(xv == yv, s"row $i col $j: $xv vs $yv")
        }
      }
    }
  }

  /** Run `core` on the same frame at two partitionings; compare bitwise. */
  private def invariant(frame: DataFrame, core: DataFrame => DataFrame): Unit =
    bitIdentical(core(frame.repartition(1)).collect().toSeq,
      core(frame.repartition(13)).collect().toSeq)

  // ~600 raw rows collapsed to per-(type, value) counts — the BandedRank
  // cores REQUIRE distinct values per group (their documented
  // precondition; the gates' own groupBy provides it), so the spec
  // collapses the same way before planting
  private lazy val collapsed2 = (0 until 600).map { i =>
    (s"t${i % 3}", v(i, 40).toDouble, v(i, 3) + 1L, v(i + 7, 3) + 1L)
  }.toDF("event_type", "value", "rc1", "rc2")
    .groupBy("event_type", "value")
    .agg(org.apache.spark.sql.functions.sum("rc1").as("c1"),
      org.apache.spark.sql.functions.sum("rc2").as("c2"))
    .selectExpr("event_type", "value", "c1", "c2", "c1 + c2 AS cnt")
  private lazy val collapsed3 = (0 until 600).map { i =>
    (s"t${i % 3}", v(i, 40).toDouble, v(i, 3), v(i + 7, 3), v(i + 13, 2))
  }.toDF("event_type", "value", "rc0", "rc1", "rc2")
    .groupBy("event_type", "value")
    .agg(org.apache.spark.sql.functions.sum("rc0").as("c0"),
      org.apache.spark.sql.functions.sum("rc1").as("c1"),
      org.apache.spark.sql.functions.sum("rc2").as("c2"))
    .selectExpr("event_type", "value", "c0", "c1", "c2",
      "c0 + c1 + c2 AS cnt")

  test("mannWhitney / brunnerMunzel / cliffDelta are partition-invariant") {
    invariant(collapsed2, graft.queries.Relational9.mannWhitney)
    invariant(collapsed2.drop("cnt"), graft.queries.Relational10.brunnerMunzel)
    invariant(collapsed2.drop("cnt"), graft.queries.Relational10.cliffDelta)
  }

  test("kruskalWallis is partition-invariant") {
    invariant(collapsed3, graft.queries.Relational11.kruskalWallis)
  }

  test("kendallTau and theilSen are partition-invariant") {
    val daily = (0 until 300).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2023, 1, 1).plusDays(i)),
        1000L + v(i, 500), 1L + v(i + 3, 9))
    }.toDF("day", "cents", "ords")
    invariant(daily, graft.queries.Relational11.kendallTau)
    invariant(daily.selectExpr("day", "cents"),
      graft.queries.Relational10.theilSen)
  }

  test("brownForsythe and anova are partition-invariant") {
    val ev = (0 until 600).map { i =>
      (s"t${i % 3}", v(i, 2), 100L + v(i, 97) * 1000L)
    }.toDF("event_type", "variant", "x6")
    invariant(ev, graft.queries.Relational11.brownForsythe)
    val ev3 = (0 until 600).map { i =>
      (s"t${i % 3}", v(i, 3), 100L + v(i, 97) * 1000L)
    }.toDF("event_type", "variant", "x6")
    invariant(ev3, graft.queries.Relational11.anova)
  }

  test("permTest and cuped are partition-invariant") {
    val ev = (0 until 600).map { i =>
      (s"t${i % 3}", (i % 120).toLong, 100L + v(i, 97) * 1000L)
    }.toDF("event_type", "user_id", "x6")
    invariant(ev, (d: DataFrame) => graft.queries.Relational11.permTest(d, 16))
    val users = (0 until 400).map { i =>
      (s"t${i % 3}", v(i, 2), v(i, 50000), v(i + 11, 50000))
    }.toDF("event_type", "variant", "x", "y")
    invariant(users, graft.queries.Relational11.cuped)
  }

  test("welchTtest and sketchQuantile are partition-invariant") {
    val ev = (0 until 600).map { i =>
      (s"t${i % 3}", v(i + 11, 2), 100000L + v(i, 997) * 1000L)
    }.toDF("event_type", "variant", "x6")
    invariant(ev, graft.queries.Relational12.welchTtest)
    val sk = (0 until 600).map { i =>
      (s"t${i % 3}", v(i + 5, 9).toLong, 100000L + v(i, 997) * 1000L)
    }.toDF("event_type", "day", "x6")
    invariant(sk, (d: DataFrame) =>
      graft.queries.Relational12.sketchQuantile(d, None))
  }

  test("medianCi is partition-invariant") {
    val ev = (0 until 700).map { i =>
      (s"t${i % 3}", 100000L + v(i, 997) * 1000L)
    }.toDF("event_type", "x6")
    invariant(ev, graft.queries.Relational12.medianCi)
  }
}
