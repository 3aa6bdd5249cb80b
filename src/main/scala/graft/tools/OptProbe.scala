package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-16 optimization scratch probe (dev-only, rewritten per
  * experiment). Current experiment: the exact-percentile class — where the
  * time goes (per-row OpenHashMap updates vs scan vs merge), and whether
  * (a) fusing separate percentile calls into ONE array-percentile buffer
  * and (b) collapsing to a (value, count) histogram + the `frequency`
  * argument win at sf0.1. */
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

    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))

    time("warmup scan-agg")(run(li.groupBy(col("l_returnflag")).agg(count(lit(1)))))
    // cardinalities for reference
    println("distinct qty   = " + li.select(col("l_quantity")).distinct().count())
    println("distinct price = " + li.select(col("l_extendedprice")).distinct().count())

    // ---- q_quantiles shapes ----
    def qA: DataFrame = li.groupBy(col("l_returnflag")).agg(
      expr("percentile(l_quantity, 0.25)").as("q25"),
      expr("percentile(l_quantity, 0.5)").as("q50"),
      expr("percentile(l_quantity, 0.75)").as("q75"),
      expr("percentile(l_extendedprice, 0.9)").as("price_q90"))
      .orderBy(col("l_returnflag"))
    def qB: DataFrame = li.groupBy(col("l_returnflag")).agg(
      expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))").as("eq"),
      expr("percentile(l_extendedprice, 0.9)").as("price_q90"))
      .select(col("l_returnflag"),
        expr("get(eq, 0)").as("q25"), expr("get(eq, 1)").as("q50"),
        expr("get(eq, 2)").as("q75"), col("price_q90"))
      .orderBy(col("l_returnflag"))
    // collapsed histogram + frequency, both columns
    def qC: DataFrame = {
      val qh = li.groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D), cnt)").as("eq"))
      val ph = li.groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, 0.9, cnt)").as("price_q90"))
      qh.join(ph, "l_returnflag")
        .select(col("l_returnflag"),
          expr("get(eq, 0)").as("q25"), expr("get(eq, 1)").as("q50"),
          expr("get(eq, 2)").as("q75"), col("price_q90"))
        .orderBy(col("l_returnflag"))
    }
    // isolate: qty-only and price-only single-buffer aggs
    def qtyOnly = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))").as("eq"))
    def priceOnly = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.9)").as("p90"))
    def priceFreq = li.groupBy(col("l_returnflag"), col("l_extendedprice"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.9, cnt)").as("p90"))
    def qtyFreq = li.groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D), cnt)").as("eq"))

    time("q_quantiles A (current: 4 buffers)")(run(qA))
    time("q_quantiles B (array: 2 buffers)")(run(qB))
    time("q_quantiles C (collapsed + frequency)")(run(qC))
    time("qty-only array percentile (per-row)")(run(qtyOnly))
    time("qty-only collapsed + frequency")(run(qtyFreq))
    time("price-only percentile (per-row)")(run(priceOnly))
    time("price-only collapsed + frequency")(run(priceFreq))

    val a = qA.collect().map(_.toString); val b = qB.collect().map(_.toString)
    val c = qC.collect().map(_.toString)
    println(s"IDENTICAL A=B: ${a.sameElements(b)}  A=C: ${a.sameElements(c)}")
    if (!a.sameElements(c)) a.zip(c).foreach { case (p, q) => if (p != q) println(s"  A=$p\n  C=$q") }

    // ---- e_mad_outliers shapes ----
    def madCur = graft.queries.Etl2.queries("e_mad_outliers")(spark, dir)
    def madHist: DataFrame = {
      val li2 = Tables.lineitem(spark, dir)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") *
            when(col("l_orderkey") % 997 === 0 && col("l_linenumber") === 1, lit(10))
              .otherwise(lit(1))).as("x"))
      val hist = li2.groupBy(col("l_returnflag"), col("x"))
        .agg(count(lit(1)).as("cnt")).localCheckpoint()
      val med = hist.groupBy(col("l_returnflag"))
        .agg(expr("percentile(x, 0.5D, cnt)").as("med"))
      val mad = hist.join(broadcast(med), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(abs(x - med), 0.5D, cnt)").as("mad"), first(col("med")).as("med"))
      li2.join(broadcast(mad), "l_returnflag")
        .withColumn("score", abs(col("x") - col("med")) / (lit(1.4826) * col("mad")))
        .filter(col("score") > 3.0)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("x"), col("med"), col("mad"), col("score"))
        .orderBy(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("x"))
    }
    time("e_mad_outliers current (3 fact passes)")(run(madCur))
    time("e_mad_outliers histogram+frequency")(run(madHist))
    val m1 = madCur.collect().map(_.toString); val m2 = madHist.collect().map(_.toString)
    println(s"IDENTICAL mad: ${m1.sameElements(m2)} (${m1.length} rows)")
    if (!m1.sameElements(m2))
      m1.zip(m2).take(2000).foreach { case (p, q) => if (p != q) println(s"  cur=$p\n  new=$q") }

    // ---- q_histogram_eqd shapes ----
    def eqdCur = graft.queries.Relational6.queries("q_histogram_eqd")(spark, dir)
    def eqdHist: DataFrame = {
      val lix = Tables.lineitem(spark, dir).select(col("l_extendedprice").as("x"))
      val hist = lix.groupBy(col("x")).agg(count(lit(1)).as("cnt")).localCheckpoint()
      val th = hist.agg(expr(
        "percentile(x, array(0.125D, 0.25D, 0.375D, 0.5D, 0.625D, 0.75D, 0.875D), cnt)")
        .cast("array<double>").as("th"))
      hist.crossJoin(broadcast(th))
        .withColumn("bucket",
          expr("1 + aggregate(th, 0, (a, t) -> a + (CASE WHEN x > t THEN 1 ELSE 0 END))"))
        .groupBy(col("bucket"))
        .agg(sum(col("cnt")).as("n"), min(col("x")).as("lo"), max(col("x")).as("hi"))
        .orderBy(col("bucket"))
    }
    time("q_histogram_eqd current")(run(eqdCur))
    time("q_histogram_eqd histogram+frequency")(run(eqdHist))
    val h1 = eqdCur.collect().map(_.toString); val h2 = eqdHist.collect().map(_.toString)
    println(s"IDENTICAL eqd: ${h1.sameElements(h2)}")
    if (!h1.sameElements(h2)) h1.zip(h2).foreach { case (p, q) => if (p != q) println(s"  cur=$p\n  new=$q") }

    spark.stop()
  }
}
