package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level quarantine — the ETL pattern between "validate-and-abort"
  * (Validate / the n2k no-NA-keys rule) and "silently drop": rows that
  * violate any rule are DIVERTED with the names of every rule they broke,
  * clean rows flow on unchanged. The reference's stop-on-invalid contract
  * is right for keyed dimension imports; a 100 TB fact ingest wants the
  * bad 0.1% parked in a quarantine sink with reasons (for replay after a
  * fix) while the clean mass proceeds.
  *
  * Scale shape: ONE narrow projection evaluates every rule per row (no
  * per-rule pass, no shuffle — the split is two filters over the same
  * scan, and with the annotate() form a single scan emitting one frame).
  * Reasons are a deterministic comma-joined list in rule order, so the
  * verdict column is exactly oracle-expressible.
  */
object Quarantine {

  final case class Rule(name: String, predicate: Column)

  /** Reason expression: comma-joined names of every violated rule (a row
    * violates a rule when its predicate is false OR null — NA counts as a
    * violation, the reference's NA-check semantics); clean rows get NULL. */
  private def reasons(rules: Seq[Rule]): Column = {
    val parts = rules.map(r =>
      when(coalesce(r.predicate, lit(false)), lit(null).cast("string"))
        .otherwise(lit(r.name)))
    val joined = concat_ws(",", parts: _*)
    when(joined === "", lit(null).cast("string")).otherwise(joined)
  }

  /** One frame, every input row, with a `quarantine_reasons` column (NULL
    * = clean). The single-scan form — downstream writes clean rows to the
    * target and reasons-rows to the quarantine sink from one pass. */
  def annotate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "quarantine needs at least one rule")
    require(rules.forall(!_.name.contains(",")),
      "rule names must not contain ',' — it is the reasons separator")
    require(rules.map(_.name).distinct.size == rules.size,
      "rule names must be unique")
    df.withColumn("quarantine_reasons", reasons(rules))
  }

  /** (clean, quarantined) split — quarantined rows carry their reasons. */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val annotated = annotate(df, rules)
    (annotated.filter(col("quarantine_reasons").isNull).drop("quarantine_reasons"),
      annotated.filter(col("quarantine_reasons").isNotNull))
  }
}
