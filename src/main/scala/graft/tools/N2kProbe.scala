package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.N2kBinding
import graft.api.N2kBinding.Graph

/** Dev diagnostic: phase-level timing of the e_store_n2k gate shape at an
  * arbitrary SF — decomposes span / prepare / commit / summary so perf
  * work targets the real residue instead of guessing. Not part of the
  * driver contract. */
object N2kProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $n%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    graft.Tables.lineitem(spark, dir).count() // warm footers/codegen
    for (round <- 1 to 3) {
      println(s"[probe] --- round $round ---")
      val t0 = System.nanoTime()
      val span = time("span") {
        val sp = N2kBinding.window(spark, dir, "1996-01-01", "1999-01-01", keepDate = true)
          .localCheckpoint()
        sp
      }
      val w1 = span.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz")).drop("o_orderdate")
      val w2 = span.filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp_ntz")).drop("o_orderdate")
      time("fused")(N2kBinding.importPairSummary(w1, w2).queryExecution.toRdd.count())
      println(f"[probe] total        ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      if (round == 1)
        println(s"[probe] span partitions: ${span.rdd.getNumPartitions}")
    }
    spark.stop()
  }
}
