package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.JdbcUpsertSink
import graft.sources.JdbcUpsertSink.Config

/** The reference's store_* flow as ONE composed operator: each exported
  * store function there validates the incoming frame, hash-keys it,
  * normalizes dimensions, and upserts staged rows transactionally. This is
  * the same contract over Spark, assembled from the §2B operators:
  *
  *   validate → stable ids → dim split → merge classify → (optional) JDBC
  *
  * One pass over the input for validation, one narrow map for ids, one
  * distinct per dimension, one key-shuffle join for the merge — nothing
  * else. At 100 TB the only data-sized shuffle is the merge join.
  */
object StorePipeline {

  final case class Spec(
      keyCols: Seq[String],
      attrCols: Seq[String],
      dims: Seq[(String, Seq[String])] = Nil, // skColName -> dim natural-key cols
      rules: Seq[Validate.Rule] = Nil)

  final case class Result(
      violations: DataFrame,   // (rule, n_violations, n_rows)
      dims: Map[String, DataFrame],
      merged: DataFrame)       // key + attrs + dim sks + action

  /** Validate, key, normalize and merge `incoming` against `current`.
    * Throws when a validation rule fails and `strict` is set (the
    * reference's stop-on-invalid behavior). */
  def store(spark: SparkSession, current: DataFrame, incoming: DataFrame, spec: Spec,
      strict: Boolean = true): Result = {
    Validate.requireColumns(incoming, spec.keyCols ++ spec.attrCols)
    val report = Validate.report(incoming, spec.rules)
    if (strict && spec.rules.nonEmpty) {
      val bad = report.filter(col("n_violations") > 0).collect()
      require(bad.isEmpty,
        s"validation failed: ${bad.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", ")}")
    }
    val dims = spec.dims.map { case (sk, cols) =>
      sk -> DimNormalize.split(incoming, cols, spec.keyCols, sk)._1
    }.toMap
    val withSks = spec.dims.foldLeft(incoming) { case (df, (sk, cols)) =>
      df.withColumn(sk, StableId.stableId(cols.map(col)))
    }
    val curWithSks = spec.dims.foldLeft(current) { case (df, (sk, cols)) =>
      df.withColumn(sk, StableId.stableId(cols.map(col)))
    }
    val attrs = spec.attrCols ++ spec.dims.map(_._1)
    val merged = UpsertMerge.merge(curWithSks, withSks, spec.keyCols, attrs)
    Result(report, dims, merged)
  }

  /** store + write: dimension tables upsert FIRST (FK order, like the
    * reference's store_* call graph — facts must never reference dimension
    * rows that aren't committed yet), then the changed fact rows land via
    * the staged transactional JDBC upsert.
    *
    * @param dimTables sk column -> existing JDBC dimension table (keyed by
    *                  the sk column); dims without an entry are computed but
    *                  not written. */
  def storeAndWrite(spark: SparkSession, current: DataFrame, incoming: DataFrame,
      spec: Spec, jdbcUrl: String, table: String,
      dimTables: Map[String, String] = Map.empty): Result = {
    val r = store(spark, current, incoming, spec)
    for ((sk, dimTable) <- dimTables; dim <- r.dims.get(sk)) {
      JdbcUpsertSink.upsertViaStaging(dim, Config(jdbcUrl, dimTable, Seq(sk)))
    }
    val changed = r.merged.filter(col("action").isin(UpsertMerge.Insert, UpsertMerge.Update))
      .drop("action")
    JdbcUpsertSink.upsertViaStaging(changed, Config(jdbcUrl, table, spec.keyCols))
    r
  }
}
