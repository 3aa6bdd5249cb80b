package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of q_theil_sen (queries/Relational10.theilSen): the
  * median-of-pairwise-slopes estimator must select the exact lower-median
  * rational, agree in sign with Mann–Kendall's S on planted trends, and be
  * indifferent to the integer-division convention of the slope key. */
class TheilSenSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def daily(rows: Seq[(String, Long)]): DataFrame =
    rows.toDF("d", "cents").select(to_date(col("d")).as("day"), col("cents"))

  private def run(rows: Seq[(String, Long)]): (Long, Double) =
    graft.queries.Relational10.theilSen(daily(rows))
      .as[(Long, Double)].head()

  /** Mann–Kendall S = Σ_{i<j} sign(x_j − x_i), computed directly. */
  private def mkS(cents: Seq[Long]): Long =
    (for (i <- cents.indices; j <- i + 1 until cents.size)
      yield math.signum(cents(j) - cents(i)).toLong).sum

  private val days = (1 to 5).map(i => f"2020-01-0$i%d")

  test("hand-computed series: lower median of the 10 pairwise slopes is exact") {
    // cents 10,20,40,30,50 → slopes sorted:
    // -10, 5, 5, 20/3, 10, 10, 10, 15, 20, 20 ; m = (10+1) div 2 = 5 → 10
    val cents = Seq(10L, 20L, 40L, 30L, 50L)
    val (n, slope) = run(days.zip(cents))
    assert(n == 10L)
    assert(slope == 10.0, s"lower median slope must be 10, got $slope")
    assert(mkS(cents) > 0 && slope > 0, "sign must agree with MK S")
  }

  test("planted decreasing trend: negative slope, sign agrees with MK S") {
    val cents = Seq(50L, 40L, 30L, 20L, 10L)
    val (n, slope) = run(days.zip(cents))
    assert(n == 10L && slope == -10.0)
    assert(mkS(cents) < 0 && slope < 0)
  }

  test("constant series: slope exactly 0 over all C(n,2) pairs") {
    val cents = Seq(7L, 7L, 7L, 7L)
    val (n, slope) = run(days.take(4).zip(cents))
    assert(n == 6L && slope == 0.0)
  }

  test("extreme slopes straddling zero: the key span exceeds Long, the banding must not wrap") {
    // slopes +5e18/S, 0, −5e18/S: each key honors |slope|·S < 2⁶³ but
    // hi − lo = 1e19 wraps Long — the histogram must band on the
    // DECIMAL(38,0) fallback (a silent wrap debands the histogram and
    // selects a wrong median; the true lower median is the middle pair, 0)
    val rows = Seq("2020-01-01" -> 0L, "2020-01-02" -> 50000000000L,
      "2020-01-03" -> 0L)
    val (n, slope) = run(rows)
    assert(n == 3L)
    assert(slope == 0.0, s"median of (+5e10, 0, -5e10) slopes must be 0, got $slope")
  }

  test("slope-key contract breach fails loudly instead of wrapping the key") {
    // |Δcents| = 1e11 > (2⁶³−1)/S ≈ 9.22e10: the skey terms exceed Long.
    // Under Spark 4's default ANSI mode the multiplication itself throws
    // (SparkArithmeticException, loud); under ansi.enabled=false it would
    // wrap SILENTLY and select a wrong median — the pass-1 max|dc| guard
    // raises the domain-named IllegalArgumentException there. Either way
    // the invariant is: a breached series NEVER returns a result.
    val rows = Seq("2020-01-01" -> 0L, "2020-01-02" -> 100000000000L)
    val e = intercept[Exception] {
      graft.queries.Relational10.theilSen(daily(rows)).count()
    }
    val loud = e.isInstanceOf[IllegalArgumentException] ||
      e.getClass.getName.contains("Arithmetic")
    assert(loud, s"expected a loud overflow failure, got ${e.getClass}: ${e.getMessage}")
  }

  test("degenerate single-day frame: zero pairs, empty result, gate schema intact") {
    val out = graft.queries.Relational10.theilSen(daily(Seq("2020-01-01" -> 42L)))
    assert(out.count() == 0L)
    assert(out.columns.toSeq == Seq("n_pairs", "slope_cents_per_day"))
    assert(out.schema("n_pairs").dataType.typeName == "long")
    assert(out.schema("slope_cents_per_day").dataType.typeName == "double")
  }

  test("negative fractional slope: the key's division convention cannot leak into the output") {
    // one pair, slope −1/3 — the scaled key is a NON-INTEGER negative
    // rational, where floor (DuckDB) and truncate (Spark) disagree by 1;
    // the output carries the raw IEEE division (un-rounded since the r14
    // x6-pin sweep — exact-integer inputs make the chain bitwise
    // deterministic), not the key
    val (n, slope) = run(Seq("2020-01-01" -> 100L, "2020-01-04" -> 99L))
    assert(n == 1L)
    assert(slope == -1.0 / 3.0, s"got $slope")
  }
}
