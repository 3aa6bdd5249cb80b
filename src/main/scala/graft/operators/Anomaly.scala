package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Statistical anomaly detection — the scale-out counterpart of the
  * reference's `anomaly` fact concept (n2kupdate stores per-analysis anomaly
  * records next to results; here the anomalies themselves are computed from
  * the data): flag rows whose value deviates more than k standard deviations
  * from their group's mean.
  *
  * Two-pass shape that holds at 100 TB:
  *   1. one aggregation shuffle computes per-group (n, Σx, Σx²) — partial
  *      map-side combine collapses each partition to |groups| rows;
  *   2. the tiny stats table (|groups| rows) broadcasts back onto the fact
  *      scan, so scoring is a NARROW map — the fact table never shuffles.
  *
  * Determinism: the moment sums run in exact decimal (order-independent
  * under any partitioning / AQE re-plan — the OracleParity convention), and
  * the z-score is derived from them with a fixed IEEE expression shape, so
  * results are bitwise-reproducible at any cluster size. A constant group
  * (σ = 0) yields no anomalies: z is NaN/±Inf, which fails the |z| > k
  * comparison on both engines rather than flagging the whole group.
  */
object Anomaly {

  /** @param groupCols cohort columns (stats computed per distinct combo)
    * @param valueCol  numeric column to score
    * @param k         flag threshold in standard deviations */
  final case class Spec(groupCols: Seq[String], valueCol: String, k: Double = 3.0)

  private val Dec = DecimalType(18, 6)
  private val DecSq = DecimalType(24, 6) // x² of 6-decimal inputs needs headroom

  /** Per-group moment table: groupCols + (n, s1, s2) with exact-decimal
    * sums surfaced as doubles. */
  def stats(df: DataFrame, spec: Spec): DataFrame = {
    val x = col(spec.valueCol)
    df.groupBy(spec.groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(x.cast(Dec)).cast(DoubleType).as("s1"),
        sum((x * x).cast(DecSq)).cast(DoubleType).as("s2"))
  }

  /** z-score expression shared by `flag` and the oracle SQL generator —
    * ONE formula, (x - s1/n) / nullif(sqrt(greatest(s2/n - (s1/n)*(s1/n),
    * 0)), 0), so the engine and any SQL mirror cannot drift. The greatest
    * clamps the tiny NEGATIVE variance double rounding can produce for a
    * constant group (DuckDB hard-errors on sqrt(<0); Spark yields NaN —
    * both wrong); the nullif then keeps σ=0 NULL (not flagged) instead of
    * an ANSI divide-by-zero error. */
  private def zOf(x: Column, n: Column, s1: Column, s2: Column): Column = {
    val mean = s1 / n
    (x - mean) / nullif(sqrt(greatest(s2 / n - mean * mean, lit(0.0))), lit(0.0))
  }

  /** Rows exceeding the threshold, annotated with their z-score. Keeps the
    * input columns; adds `zscore`. The THRESHOLD test runs on the raw
    * double (symmetric boundary), but the EMITTED zscore is pinned to 6
    * decimals (OracleParity.x6): z is derived from decimal moment sums
    * whose double conversion can round apart by an ulp between engines
    * once per-group Σx² outgrows 2^53 in 6-decimal units — the same
    * rationale as qCorr's pinned moments. */
  def flag(df: DataFrame, spec: Spec): DataFrame = {
    val st = stats(df, spec)
    val joined = // empty groupCols = global stats (1-row broadcast)
      if (spec.groupCols.isEmpty) df.crossJoin(broadcast(st))
      else df.join(broadcast(st), spec.groupCols)
    joined
      .withColumn("zscore", zOf(col(spec.valueCol), col("n"), col("s1"), col("s2")))
      .filter(abs(col("zscore")) > spec.k)
      .withColumn("zscore", graft.functions.OracleParity.x6(col("zscore")))
      .drop("n", "s1", "s2")
  }

  /** DuckDB mirror of the full flag pipeline (for oracle generation):
    * identical decimal moments and the identical z expression shape. */
  def oracleSql(table: String, groupCols: Seq[String], valueCol: String,
      k: Double, outCols: Seq[String], orderBy: String): String = {
    val z = s"(e.$valueCol - s1/n) / nullif(sqrt(greatest(s2/n - (s1/n)*(s1/n), 0.0)), 0.0)"
    val selG = if (groupCols.isEmpty) "" else groupCols.mkString("", ", ", ",")
    val groupBy = if (groupCols.isEmpty) "" else groupCols.mkString(" GROUP BY ", ", ", "")
    val join = // empty groupCols = global stats (1-row cross join), like flag()
      if (groupCols.isEmpty) "CROSS JOIN st"
      else s"JOIN st USING (${groupCols.mkString(", ")})"
    s"""WITH st AS (
       |  SELECT $selG COUNT(*) AS n,
       |    CAST(SUM(CAST($valueCol AS DECIMAL(18,6))) AS DOUBLE) AS s1,
       |    CAST(SUM(CAST($valueCol * $valueCol AS DECIMAL(24,6))) AS DOUBLE) AS s2
       |  FROM $table$groupBy)
       |SELECT ${outCols.mkString(", ")},
       |  CAST(CAST(zscore AS DECIMAL(18,6)) AS DOUBLE) AS zscore FROM (
       |  SELECT e.*, $z AS zscore FROM $table e $join)
       |WHERE abs(zscore) > $k ORDER BY $orderBy""".stripMargin
  }
}
