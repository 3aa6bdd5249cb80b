package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Helpers that make float aggregates bitwise-reproducible across engines
  * and partition orders (SURVEY.md §6).
  *
  * Summing doubles is order-dependent, so a shuffle re-order (or a different
  * engine) changes the last ulps. Convention: compute the per-row expression
  * in double (IEEE — identical everywhere), round it to DECIMAL(18,6) per
  * row (deterministic), sum exactly in decimal (order-independent), and cast
  * the final value back to double. The same convention is expressible in the
  * DuckDB oracle as CAST(SUM(CAST(expr AS DECIMAL(18,6))) AS DOUBLE).
  *
  * This is also the right thing at 100 TB: decimal partial aggregates are
  * exact under any AQE re-partitioning, so results don't wobble run-to-run.
  *
  * r15 optimization (guide §2.3/§4): the EXACT decimal total is computed by
  * graft.operators.SplitSum — the scale-6 micro-units' `>>24` and
  * `&(2^24−1)` halves summed as plain codegen longs, reassembled into the
  * identical decimal value after the aggregate — instead of per-row Decimal
  * accumulation. Value- and therefore double-bit-identical (SplitSumSpec),
  * ~0.5 s faster per fact-scale aggregation at sf0.1. The per-row rounding
  * cast (the convention itself) is untouched; rows whose magnitude
  * overflows DECIMAL(18,6) still become null before the sum on both forms.
  * Bounds: |micro| < 10^18 by Dec(18,6)'s ceiling, so Σlo < n·2^24 and
  * Σhi < n·max|micro|/2^24 hold to ≥10^10 rows/group at the repo's
  * ≤10^7-magnitude values — past the documented ≲2·10^9-row contract.
  */
object OracleParity {
  private val Dec = DecimalType(18, 6)
  private val Out = DecimalType(38, 6)
  private val Shift = graft.operators.SplitSum.Shift
  private val Half = 1L << Shift

  /** The exact DECIMAL(38,6) total of `c` rounded per-row to scale 6 —
    * one Column carrying the two split-half sums plus the reassembly. */
  private def decTotal(c: Column): Column = {
    val m = (c.cast(Dec) * lit(1000000L)).cast("long")
    ((sum(shiftright(m, Shift)).cast(DecimalType(38, 0)) * lit(Half) +
      sum(m.bitwiseAND(lit(Half - 1))).cast(DecimalType(38, 0))) /
      lit(1000000L)).cast(Out)
  }

  /** Order-independent sum of a double expression. */
  def xsum(c: Column): Column = decTotal(c).cast(DoubleType)

  /** Order-independent mean of a double expression. */
  def xavg(c: Column): Column =
    decTotal(c).cast(DoubleType) / count(c.cast(Dec)).cast(DoubleType)

  /** Round a double to 6 decimals deterministically (via decimal). */
  def x6(c: Column): Column = c.cast(Dec).cast(DoubleType)
}
