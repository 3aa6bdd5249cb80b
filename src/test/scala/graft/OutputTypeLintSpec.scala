package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Output-schema TYPE lint (VERDICT r14 "Next round" #2a): every gate's
  * output schema may use ONLY the types the driver's hash compare coerces
  * identically on both of its read paths —
  *
  *   int / bigint / double / string / boolean / date / timestamp
  *
  * The class this guards against cost three rounds: a gate emitting a raw
  * DECIMAL(38,0) column passes rows+schema but hash-FAILS at the driver,
  * because the driver reads the Spark parquet through pyarrow (decimal128
  * → python Decimal objects) while the DuckDB oracle frame coerces DECIMAL
  * → float64 — `Decimal('28834') != 28834.0` under the value hash. The
  * local check.py replica was blind to it until r15 because it routed BOTH
  * sides through DuckDB (see tools/check.py, reworked the same round).
  * q_ks_test shipped exactly this red for three consecutive driver runs
  * (r12→r14) before the r14 judge's pyarrow schema sweep named the 7
  * decimal output columns in the 3 red gates — a 3/3-vs-0/360 correlation.
  *
  * The de-facto contract was already real (360/363 gates complied;
  * e_table_checksum deliberately STRING-casts its >2⁶³ checksum,
  * Etl3.scala) — this spec just makes it machine-enforced: DECIMAL
  * arithmetic stays INTERNAL to a gate, and the output column is cast
  * BIGINT when bounded < 2⁶³ by the gate's n-contract, STRING otherwise.
  *
  * Sweep mechanics mirror WindowLintSpec: the Ckpt bypass keeps gate
  * construction lazy (schema derivation is pure analysis for batch gates),
  * and StageCache is dropped around the sweep so cached stages built WITH
  * checkpoints by earlier suites don't leak into — or out of — the bypass.
  * st_ gates ARE included (their builders execute micro-batches at
  * construction, bounded at sf0.001): they dump parquet through the same
  * driver gate as everything else, so their output types are equally
  * load-bearing.
  */
class OutputTypeLintSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def allowed(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | DoubleType | StringType | BooleanType |
         DateType | TimestampType => true
    case _ => false // DECIMAL, FLOAT, BINARY, ARRAY, MAP, STRUCT, ...
  }

  private def offending(schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case f if !allowed(f.dataType) => s"${f.name}:${f.dataType.simpleString}"
    }

  test("every gate's output schema uses only driver-coercible types " +
      "(int, bigint, double, string, boolean, date, timestamp)") {
    System.setProperty("graft.lint.noCheckpoint", "true")
    StageCache.release(spark)
    val bad = scala.collection.mutable.LinkedHashMap[String, Seq[String]]()
    try SparkEntry.queries.keys.toSeq.sorted.foreach { g =>
      val off = offending(SparkEntry.queries(g)(spark, dir).schema)
      if (off.nonEmpty) bad(g) = off
    } finally {
      System.clearProperty("graft.lint.noCheckpoint")
      StageCache.release(spark)
    }
    assert(bad.isEmpty,
      "gate output columns outside the driver-coercible type set — cast " +
        "BIGINT if bounded < 2^63 by the gate's n-contract, STRING if not " +
        "(the e_table_checksum convention):\n" +
        bad.map { case (g, off) => s"  $g → ${off.mkString(", ")}" }.mkString("\n"))
  }

  test("control: a planted DECIMAL(38,0) output column is flagged") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("n", "k")
      .select(col("k"), (col("n").cast(DecimalType(19, 0)) *
        col("n").cast(DecimalType(19, 0))).cast(DecimalType(38, 0)).as("n_sq"))
    val off = offending(df.schema)
    assert(off == Seq("n_sq:decimal(38,0)"), off.toString)
  }

  test("control: float, binary, and array outputs are flagged too") {
    import spark.implicits._
    val df = Seq((1.0f, Array[Byte](1), Seq(1))).toDF("f", "b", "a")
    assert(offending(df.schema).size == 3, offending(df.schema).toString)
  }
}
