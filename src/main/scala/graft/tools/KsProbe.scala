package graft.tools

import org.apache.spark.sql.SparkSession

/** Raw-bits determinism probe for q_ks_test: dumps every output row of
  * the gate with the IEEE-754 bit pattern (doubleToLongBits, hex) of the
  * two float columns `d` and `d_crit`, next to the exact integer inputs
  * (n1, n2, d_num) they derive from — AND an independent pure-JVM
  * recomputation of the same chains from those integers. If the driver's
  * DuckDB compare ever hash-fails this gate again, re-running this probe
  * on the driver's dataset names the exact (row, column, bit pattern)
  * that diverged instead of reporting an opaque hash mismatch (the r13
  * failure class: an x6 rounding-boundary pin, since removed — the gate
  * now emits the raw chains, which with exact integer inputs are
  * bitwise-deterministic across engines per the q_bollinger rule).
  *
  * The pure-JVM recompute cross-checks Spark's DECIMAL(38,0)→DOUBLE cast
  * path: `jvm_d` uses BigDecimal.doubleValue on the exact d_num and
  * n1·n2 (both correctly-rounded conversions), `jvm_crit` the plain
  * double chain. A spark!=jvm mismatch localizes the divergence to the
  * cast path; spark==jvm with a driver hash-fail localizes it to DuckDB's
  * HUGEINT→DOUBLE conversion of the SAME integers. Measurement-only. */
object KsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rows = graft.queries.Relational10.qKsTest(spark, dir).collect()
    println("[ksprobe] type n1 n2 d_num | d_bits jvm_d_bits eq | crit_bits jvm_crit_bits eq")
    var mismatches = 0
    rows.foreach { r =>
      val et = r.getString(0)
      val n1 = r.getLong(1); val n2 = r.getLong(2)
      val dNum = r.getDecimal(3)
      val d = r.getDouble(4); val crit = r.getDouble(5)
      val n1n2 = new java.math.BigDecimal(n1).multiply(new java.math.BigDecimal(n2))
      val jvmD = dNum.doubleValue() / n1n2.doubleValue()
      val jvmCrit = 1.628 * math.sqrt((n1 + n2).toDouble / n1n2.doubleValue())
      val dB = java.lang.Double.doubleToLongBits(d)
      val jdB = java.lang.Double.doubleToLongBits(jvmD)
      val cB = java.lang.Double.doubleToLongBits(crit)
      val jcB = java.lang.Double.doubleToLongBits(jvmCrit)
      if (dB != jdB || cB != jcB) mismatches += 1
      println(f"[ksprobe] $et%-12s $n1%7d $n2%7d ${dNum.toPlainString}%22s | " +
        f"$dB%016x $jdB%016x ${if (dB == jdB) "OK" else "DIVERGED"}%-8s | " +
        f"$cB%016x $jcB%016x ${if (cB == jcB) "OK" else "DIVERGED"}%-8s")
    }
    println(s"[ksprobe] ${rows.length} rows, $mismatches spark-vs-jvm bit mismatches")
    spark.stop()
    if (mismatches > 0) sys.exit(1)
  }
}
