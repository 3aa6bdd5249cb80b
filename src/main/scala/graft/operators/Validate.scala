package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based input validation.
  *
  * The reference validates every incoming dataframe before staging: required
  * columns present, keys non-null, values inside domains. Re-expressed for
  * Spark: all rules evaluate in ONE scan as conditional aggregates (no
  * per-rule pass, no collect); the wide one-row result is unpivoted to a
  * (rule, n_violations, n_rows) report with `stack`.
  *
  * Schema-level checks (column exists / type matches) throw eagerly on the
  * driver — a misdeclared batch should fail fast, not produce a report.
  */
object Validate {
  final case class Rule(name: String, predicate: Column)

  /** Throws IllegalArgumentException if `required` columns are missing. */
  def requireColumns(df: DataFrame, required: Seq[String]): DataFrame = {
    val missing = required.filterNot(df.columns.contains)
    require(missing.isEmpty, s"missing required columns: ${missing.mkString(", ")}")
    df
  }

  /** One-pass violation report. A row violates a rule when the predicate is
    * false OR null (null comparisons must count as violations, like the
    * reference's NA checks). */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    if (rules.isEmpty) {
      // empty rule set -> empty report with the right schema, not a crash
      return df.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("rule", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_violations", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_rows", org.apache.spark.sql.types.LongType))))
    }
    val aggs = rules.map(r =>
      sum(when(coalesce(r.predicate, lit(false)), 0).otherwise(1)).as(r.name))
    val total = count(lit(1)).as("__n_rows")
    val wide = df.agg(aggs.head, (aggs.tail :+ total): _*)
    val stackArgs = rules.map(r => s"'${r.name}', `${r.name}`").mkString(", ")
    wide.select(
      expr(s"stack(${rules.size}, $stackArgs) as (rule, n_violations)"),
      col("__n_rows").as("n_rows"))
      .orderBy(col("rule"))
  }
}
