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
  */
object OracleParity {
  private val Dec = DecimalType(18, 6)

  /** Order-independent sum of a double expression. */
  def xsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Order-independent mean of a double expression. */
  def xavg(c: Column): Column =
    sum(c.cast(Dec)).cast(DoubleType) / count(c.cast(Dec)).cast(DoubleType)

  /** Round a double to 6 decimals deterministically (via decimal). */
  def x6(c: Column): Column = c.cast(Dec).cast(DoubleType)
}
