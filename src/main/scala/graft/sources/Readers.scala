package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-enforced ingest readers.
  *
  * The reference validates every incoming data.frame's columns/types before
  * touching the database; the Spark equivalent is reading with an EXPLICIT
  * schema (never inferSchema — a schema inference pass reads the data twice
  * and guesses, both wrong at 100 TB) plus a hard FAILFAST parse mode so a
  * malformed batch dies loudly instead of nulling out.
  */
object Readers {

  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("mode", "FAILFAST")
      .option("enforceSchema", "true")
      .csv(path)

  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  /** Quarantine ingest: PERMISSIVE parse that routes malformed rows into a
    * `_corrupt_record` column instead of dying — the ingest shape for feeds
    * where a bad row must not sink a 100 TB batch. Callers split on
    * `_corrupt_record IS NULL` (clean) vs NOT NULL (quarantine) and land
    * the quarantine rows for replay; the FAILFAST readers above stay the
    * default for validated store flows.
    *
    * Spark contract: `.cache()` the returned frame BEFORE filtering on the
    * corrupt column — a query referencing only `_corrupt_record` over raw
    * JSON throws AnalysisException by design. */
  def jsonQuarantine(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val withCorrupt = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("_corrupt_record",
        org.apache.spark.sql.types.StringType, nullable = true))
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
  }

  /** ORC with the same explicit-schema contract as parquet: columnar,
    * self-describing, so enforcement is a field-presence check (ORC readers
    * project by name; a type mismatch dies at scan time). */
  def orc(spark: SparkSession, path: String, expected: StructType): DataFrame = {
    val df = spark.read.orc(path)
    val missing = expected.fields.filterNot(f => df.schema.fieldNames.contains(f.name))
    require(missing.isEmpty,
      s"orc at $path missing expected columns: ${missing.map(_.name).mkString(", ")}")
    df.select(expected.fieldNames.map(org.apache.spark.sql.functions.col): _*)
  }

  def parquet(spark: SparkSession, path: String, expected: StructType): DataFrame = {
    val df = spark.read.parquet(path)
    val missing = expected.fields.filterNot(f => df.schema.fieldNames.contains(f.name))
    require(missing.isEmpty,
      s"parquet at $path missing expected columns: ${missing.map(_.name).mkString(", ")}")
    df
  }

  /** Range-partitioned parallel JDBC read — the scale path for pulling a
    * big database table (the reference reads its current DB state before
    * every merge): `numPartitions` executors each issue a bounded-range
    * query on `partCol` instead of one connection streaming the whole
    * table. Bounds outside [lb, ub] still land (Spark makes the first and
    * last partitions unbounded), so the read is complete regardless of the
    * bound estimates; stale bounds only skew balance, never correctness. */
  def jdbcPartitioned(spark: SparkSession, url: String, table: String,
      partCol: String, lb: Long, ub: Long, numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partCol)
      .option("lowerBound", lb.toString)
      .option("upperBound", ub.toString)
      .option("numPartitions", numPartitions.toString)
      .load()
}
