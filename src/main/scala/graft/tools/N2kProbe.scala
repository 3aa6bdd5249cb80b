package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.N2kBinding
import graft.api.N2kBinding.Graph

/** Micro-timing of the e_store_n2k gate phases (dev diagnostic). */
object N2kProbe {
  import TimeProbe.time
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    time("warmup")(graft.Tables.lineitem(spark, dir).count())
    for (_ <- 1 to 2) {
      val span = time("span checkpoint")(
        N2kBinding.window(spark, dir, "1996-01-01", "1999-01-01", keepDate = true).localCheckpoint())
      val w1 = span.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz")).drop("o_orderdate")
      val w2 = span.filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp_ntz")).drop("o_orderdate")
      val st0 = Graph.map(t => t.name -> N2kBinding.emptyState(t, w1)).toMap
      val st1 = time("importAll w1")(N2kBinding.importAll(st0, w1, stamp = 1L))
      val st2 = time("importAll w2")(N2kBinding.importAll(st1, w2, stamp = 2L))
      time("summary")(N2kBinding.summary(st2).queryExecution.toRdd.count())
      span.unpersist()
    }
    spark.stop()
  }
}
