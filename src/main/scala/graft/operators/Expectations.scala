package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectation suite — the Deequ/Great-Expectations pattern:
  * a declared set of checks (completeness, distinctness, bounds, domain
  * compliance, volume) evaluated against a dataset in ONE aggregation
  * pass, emitting a (check, metric, passed) report. This is the
  * CONTINUOUS-monitoring complement to Validate (which counts rule
  * violations for a gate decision) and e_profile (per-column stats with
  * no pass criteria): each check carries its metric AND its acceptance
  * predicate, so the report is both a dashboard and a gate.
  *
  * Scale shape: every metric is an aggregate expression over one scan —
  * the whole suite costs a single aggregation (map-side partials), and
  * the report is &#124;checks&#124; fixed rows. Metrics are doubles from
  * pinned single divisions of exact integer/decimal aggregates, so the
  * report is bit-reproducible across engines.
  */
object Expectations {

  /** One check: an aggregate metric expression and its acceptance
    * predicate over the computed metric column. */
  final case class Check(name: String, metric: Column, accept: Column => Column)

  /** Evaluate the suite: one aggregation, |checks| output rows
    * (check, metric, passed) in suite order. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "expectation suite needs at least one check")
    val aggs = checks.map(c => c.metric.cast("double").as(s"__m_${c.name}"))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.map { c =>
      val m = col(s"__m_${c.name}")
      struct(lit(c.name).as("check"), m.as("metric"),
        c.accept(m).as("passed"))
    }
    wide.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check"), col("r.metric"), col("r.passed"))
  }
}
