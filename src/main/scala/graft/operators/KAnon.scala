package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity release audit — the privacy gate run before publishing a
  * dataset: any combination of quasi-identifier values shared by fewer
  * than k records re-identifies those records, so the release pipeline
  * must either generalize the QI further (coarser bands) or suppress the
  * violating groups.
  *
  * One keyed aggregation over the QI columns; the HAVING filter rides the
  * same shuffle, so the audit costs exactly one pass at any scale and the
  * output is bounded by the number of VIOLATING groups (small by
  * definition in a release-worthy dataset, and the thing you must look at
  * when it is not).
  */
object KAnon {
  /** Violating QI groups: one row per group with population < k. */
  def audit(df: DataFrame, qi: Seq[Column], k: Int): DataFrame =
    df.groupBy(qi: _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)

  /** l-diversity audit — the leak k-anonymity misses: a QI group can be
    * comfortably k-anonymous yet carry only ONE sensitive value, so
    * membership alone discloses the sensitive attribute (homogeneity
    * attack). Violating groups have fewer than l DISTINCT sensitive
    * values; same single keyed aggregation, the distinct count rides the
    * shuffle as an extra aggregate. */
  def auditDiversity(df: DataFrame, qi: Seq[Column], sensitive: Column, l: Int): DataFrame =
    df.groupBy(qi: _*)
      .agg(count(lit(1)).as("n"), countDistinct(sensitive).as("n_sensitive"))
      .filter(col("n_sensitive") < l)
}
