package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact big-integer totals via SPLIT LONG SUMS — the r15 optimization of
  * the OracleParity decimal-sum convention (guide §2.3 "narrower types" +
  * §4 "prefer codegen-friendly expressions").
  *
  * The convention's direct form, `sum(c.cast(DecimalType(38, 0)))`, pays
  * per-row Decimal allocation + overflow checks inside the aggregate —
  * measured 0.5–0.7 s per fact-scale gate at sf0.1 (q_corr probe:
  * 1.95 s → 1.45 s). This helper sums the two HALVES of the long as plain
  * codegen longs and reassembles the exact decimal total AFTER the
  * aggregate, where only |groups| rows remain:
  *
  *   hi = c >> 24   (arithmetic shift = floor division by 2^24)
  *   lo = c & (2^24 − 1)   (non-negative remainder)
  *   c  = hi·2^24 + lo     (holds for EVERY two's-complement long,
  *                          negatives included)
  *   Σc = (Σhi)·2^24 + Σlo (exact whenever neither long sum overflows)
  *
  * Overflow bounds, documented per the repo's ≲2·10⁹-rows-per-group
  * contract: Σlo < n·2^24 stays under 2^63 for n < 2^39 ≈ 5.5·10^11 rows;
  * Σhi < n·max|c|/2^24 stays under 2^63 for n·max|c| < 2^87 — e.g.
  * max|c| = 2^44 (10^13 micro-units) allows n ≈ 8·10^12 rows. Both bounds
  * sit orders of magnitude past the documented contract; a caller summing
  * wider values raises Shift accordingly.
  *
  * Null/empty semantics match `sum` exactly: hi and lo are null on the
  * same rows as c, and an empty group yields null·2^24 + null = null.
  */
object SplitSum {
  val Shift = 24
  private val Half = 1L << Shift

  /** The two codegen-long partial aggregates for an exact sum of `c`
    * (any LongType expression). Include both in the caller's `.agg`. */
  def aggs(c: Column, name: String): Seq[Column] = Seq(
    sum(shiftright(c, Shift)).as(s"__${name}_hi"),
    sum(c.bitwiseAND(lit(Half - 1))).as(s"__${name}_lo"))

  /** The exact total as DECIMAL(38,0), reassembled from `aggs(_, name)`. */
  def total(name: String): Column =
    col(s"__${name}_hi").cast(DecimalType(38, 0)) * lit(Half) +
      col(s"__${name}_lo").cast(DecimalType(38, 0))
}
