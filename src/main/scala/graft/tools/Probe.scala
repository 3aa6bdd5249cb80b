package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: print schemas + a row of the oddball tables (ns timestamps,
  * float lists) so oracle-parity decisions are grounded in what Spark
  * actually reads. Run: sbt "runMain graft.tools.Probe". */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("events", "embeddings", "lineitem")) {
      println(s"== $t")
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        df.printSchema()
        df.show(2, false)
      } catch { case e: Throwable => println(s"READ FAILED: ${e.getMessage.take(400)}") }
    }
    spark.stop()
  }
}
