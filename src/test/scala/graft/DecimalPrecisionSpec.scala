package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** q_ks_test's ECDF numerator |cum₁·n₂ − cum₂·n₁| must survive counts
  * where the cross product exceeds 2⁶³ (VERDICT r12 "What's wrong" #2 —
  * previously a documented cliff, now coded as DECIMAL arithmetic). This
  * spec drives the EXACT expression shape the gate uses with synthetic
  * literals beyond the BIGINT range and pins the exact value, plus the
  * overflow failure the old BIGINT form produces on the same inputs, so
  * the hazard class stays visible. */
class DecimalPrecisionSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val d19 = DecimalType(19, 0)

  test("KS numerator: cum*n beyond 2^63 is exact in DECIMAL where BIGINT overflows") {
    // realistic extreme: two variants of ~5e18 rows each (the long range),
    // ECDFs mid-crossing — every cross product is ~2.5e37, far past 2^63
    val n1 = 5000000000000000000L // 5e18
    val n2 = 4999999999999999999L
    val cum1 = 4999999999999999993L
    val cum2 = 3333333333333333331L
    val df = Seq((cum1, cum2, n1, n2)).toDF("cum1", "cum2", "n1", "n2")

    // the gate's expression shape (Relational10.qKsTest)
    val dec = df.select(
      abs(col("cum1").cast(d19) * col("n2").cast(d19) -
        col("cum2").cast(d19) * col("n1").cast(d19)).as("d_num"))
      .as[java.math.BigDecimal].head()
    val expected = (BigInt(cum1) * BigInt(n2) - BigInt(cum2) * BigInt(n1)).abs
    assert(BigInt(dec.toBigInteger) == expected,
      s"decimal numerator must be exact past 2^63: got $dec want $expected")
    assert(expected > BigInt(Long.MaxValue),
      "fixture must actually exceed the BIGINT range or this spec proves nothing")

    // the hazard the decimal form removes: the same arithmetic in BIGINT
    // is a hard ARITHMETIC_OVERFLOW failure under this session's ANSI
    // default (and a silent wrap under non-ANSI configs) — either way the
    // gate would not have survived these counts
    val e = intercept[Exception] {
      df.select(abs(col("cum1") * col("n2") - col("cum2") * col("n1")).as("w"))
        .as[Long].head()
    }
    val messages = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(messages.contains("ARITHMETIC_OVERFLOW"),
      s"BIGINT form must overflow — the cliff was real (got: ${messages.take(160)})")

    // headroom: the worst representable case n1=n2=cum ~ 2^63 stays inside
    // DECIMAL(38,0): |cum·n| < (2^63)^2 ≈ 8.6e37 < 1e38, and the difference
    // is bounded by n1·n2 < 2.2e37 — no overflow-to-null anywhere
    val worst = Seq((Long.MaxValue, 0L, Long.MaxValue, Long.MaxValue))
      .toDF("cum1", "cum2", "n1", "n2")
      .select((col("cum1").cast(d19) * col("n2").cast(d19) -
        col("cum2").cast(d19) * col("n1").cast(d19)).as("d_num"))
      .as[java.math.BigDecimal].head()
    assert(worst != null && BigInt(worst.toBigInteger) ==
      BigInt(Long.MaxValue) * BigInt(Long.MaxValue),
      "DECIMAL(38,0) must hold the worst-case product without overflowing to null")
  }
}
