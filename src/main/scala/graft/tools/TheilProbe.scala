package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Ckpt._

/** Stage-timing probe for q_theil_sen: times each pipeline stage
  * separately so a regression localizes (pair expansion vs keying vs
  * banded prefix vs selection). Measurement-only; not part of the gate. */
object TheilProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    val daily = Tables.orders(spark, dir)
      .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg((sum(col("o_totalprice").cast("decimal(18,6)")) * lit(100L))
        .cast("long").as("cents"))
      .cpLazy
    t("daily")(daily.count())
    val par = spark.sparkContext.defaultParallelism
    val a = daily.repartition(par).select(col("day").as("da"), col("cents").as("ca"))
    val b = daily.select(col("day").as("db"), col("cents").as("cb"))
    val pairs = a.join(b, col("da") < col("db"))
      .select((col("cb") - col("ca")).as("dc"),
        datediff(col("db"), col("da")).cast("long").as("dd"))
    t("pairs")(pairs.count())
    val S = graft.queries.Relational10.TheilSenScale
    val withKey = pairs.withColumn("skey",
      expr(s"(dc div dd) * ${S}L + ((dc % dd) * ${S}L) div dd"))
    t("keyed-nogroup")(withKey.count())
    val keyed = withKey.groupBy(col("skey"))
      .agg(count(lit(1)).as("cnt"),
        min(col("dc").cast("double") / col("dd").cast("double")).as("slope_raw"))
      .cpLazy
    t("grouped")(keyed.count())
    val c = graft.operators.BandedRank.withPrefixSums(
      keyed.withColumn("g", lit(1)), Seq("g"), "skey", Seq("cnt" -> "cum"))
    t("banded-prefix")(c.count())
    // Both full-gate timers include qTheilSen(...) CONSTRUCTION: passes
    // 1-2 of the histogram selection run driver-side during construction,
    // so starting the clock after it would time only pass 3 and the two
    // labels would not be comparable (r13 ADVICE).
    t("full-gate")(
      graft.queries.Relational10.qTheilSen(spark, dir).queryExecution.toRdd.count())
    t("full-gate-again")(
      graft.queries.Relational10.qTheilSen(spark, dir).queryExecution.toRdd.count())
    spark.stop()
  }
}
