package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-15 optimization scratch probe (dev-only, rewritten per
  * experiment). Current experiment: decimal-exact sums (the OracleParity
  * convention) via Spark's Decimal aggregate vs SPLIT LONG SUMS — sum the
  * hi/lo halves of the integer micro-units as plain codegen longs and
  * reassemble the exact decimal after aggregation. */
object OptProbe {
  def time[T](name: String, n: Int = 3)(f: => T): T = {
    var best = Double.MaxValue; var r: T = null.asInstanceOf[T]
    for (_ <- 1 to n) {
      val t0 = System.nanoTime(); r = f
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    println(f"$best%8.3f  $name"); r
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def run(df: DataFrame): Long = df.queryExecution.toRdd.count()

    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val d18 = DecimalType(18, 6); val d24 = DecimalType(24, 6)
    val (x, y) = (col("l_quantity"), col("l_extendedprice"))
    val li = Tables.lineitem(spark, dir)

    // A: current q_corr — five decimal sums
    def variantA: DataFrame = {
      val m = li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(x.cast(d18)).cast(DoubleType).as("sx"),
          sum(y.cast(d18)).cast(DoubleType).as("sy"),
          sum((x * y).cast(d24)).cast(DoubleType).as("sxy"),
          sum((x * x).cast(d24)).cast(DoubleType).as("sxx"),
          sum((y * y).cast(d24)).cast(DoubleType).as("syy"))
      val (n, sx, sy, sxy, sxx, syy) =
        (col("n"), col("sx"), col("sy"), col("sxy"), col("sxx"), col("syy"))
      m.select(col("l_returnflag"), n,
          ((n * sxy - sx * sy) /
            nullif(sqrt(greatest(n * sxx - sx * sx, lit(0.0))) *
                   sqrt(greatest(n * syy - sy * sy, lit(0.0))), lit(0.0)))
            .as("corr_qty_price"))
        .orderBy(col("l_returnflag"))
    }

    // B: split long sums — micro-units hi/lo halves summed as longs,
    // reassembled to the same exact decimal, then the same double chain.
    // x6 = (x cast d18) * 1e6 as long (exact: d18 scale-6 → integer micro).
    // For products: (x*y) cast d24 * 1e6 as long (≤ 5e12 per row — exact).
    // hi = v div 2^24 (sum ≤ n·max/2^24), lo = v mod 2^24 (sum ≤ n·2^24).
    def variantB: DataFrame = {
      val sh = 1L << 24
      def micro(c: org.apache.spark.sql.Column, t: DecimalType) =
        (c.cast(t) * lit(1000000L)).cast("long")
      def splitSum(v: org.apache.spark.sql.Column, nm: String) =
        Seq(sum(expr(s"__${nm} div $sh")).as(s"${nm}_hi"),
          sum(expr(s"__${nm} % $sh")).as(s"${nm}_lo"))
      val withM = li
        .withColumn("__sx", micro(x, d18)).withColumn("__sy", micro(y, d18))
        .withColumn("__sxy", micro(x * y, d24))
        .withColumn("__sxx", micro(x * x, d24))
        .withColumn("__syy", micro(y * y, d24))
      val aggs = Seq(count(lit(1)).as("n")) ++
        Seq("sx", "sy", "sxy", "sxx", "syy").flatMap(nm => splitSum(col(s"__$nm"), nm))
      val m0 = withM.groupBy(col("l_returnflag")).agg(aggs.head, aggs.tail: _*)
      // reassemble: (hi*2^24 + lo) in DECIMAL(38,0) micro-units, /1e6 → the
      // exact decimal the d18/d24 sum would produce, then the same cast
      def reasm(nm: String) =
        ((col(s"${nm}_hi").cast(DecimalType(38, 0)) * lit(sh) +
          col(s"${nm}_lo").cast(DecimalType(38, 0))) / lit(1000000L))
          .cast(DecimalType(38, 6)).cast(DoubleType).as(nm)
      val m = m0.select(col("l_returnflag"), col("n"),
        reasm("sx"), reasm("sy"), reasm("sxy"), reasm("sxx"), reasm("syy"))
      val (n, sx, sy, sxy, sxx, syy) =
        (col("n"), col("sx"), col("sy"), col("sxy"), col("sxx"), col("syy"))
      m.select(col("l_returnflag"), n,
          ((n * sxy - sx * sy) /
            nullif(sqrt(greatest(n * sxx - sx * sx, lit(0.0))) *
                   sqrt(greatest(n * syy - sy * sy, lit(0.0))), lit(0.0)))
            .as("corr_qty_price"))
        .orderBy(col("l_returnflag"))
    }

    time("warmup")(run(li.groupBy(col("l_returnflag")).agg(count(lit(1)))))
    time("A decimal sums (q_corr)")(run(variantA))
    time("B split long sums")(run(variantB))
    time("A decimal sums (2)")(run(variantA))
    time("B split long sums (2)")(run(variantB))
    val a = variantA.collect().map(_.toString)
    val b = variantB.collect().map(_.toString)
    println(s"IDENTICAL=${a.sameElements(b)}")
    if (!a.sameElements(b)) a.zip(b).foreach { case (p, q) => if (p != q) println(s"  A=$p\n  B=$q") }
    spark.stop()
  }
}
