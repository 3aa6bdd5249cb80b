package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-15 optimization scratch probe (dev-only, rewritten per
  * experiment). Current experiment: q_sketch_quantile sub-stage costs —
  * exact percentile_disc pass vs sketch build vs the store roundtrip. */
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

    val UsPerDay = 86400000000L
    val ev = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        expr(s"(ts div 1000) div $UsPerDay").as("day"),
        (col("value").cast("decimal(18,6)") * lit(1000000L))
          .cast("long").as("x6"))

    time("warmup")(run(ev.groupBy(col("event_type")).agg(count(lit(1)))))

    val exact = ev.groupBy(col("event_type")).agg(
      expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY x6)").as("e50"),
      expr("percentile_disc(0.90) WITHIN GROUP (ORDER BY x6)").as("e90"),
      expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY x6)").as("e99"),
      min(col("x6")).as("tlo"), max(col("x6")).as("thi"))
    time("exact percentile_disc pass")(run(exact))

    val b = graft.queries.Relational12.QSketchBuckets
    val bounds = exact.agg(min(col("tlo")).as("lo"), max(col("thi")).as("hi"))
    def sketch = ev.crossJoin(broadcast(bounds))
      .withColumn("w", expr(s"(hi - lo) div $b + 1"))
      .withColumn("bucket", expr("(x6 - lo) div w"))
      .groupBy(col("event_type"), col("day"), col("bucket"))
      .agg(count(lit(1)).as("cnt"), max(col("lo")).as("lo"), max(col("w")).as("w"))
    time("sketch build (no store)")(run(sketch))

    val out = "/tmp/graft_probe_sketch"
    time("store write (repartition day + partitionBy day)")({
      sketch.repartition(col("day"))
        .write.mode("overwrite").partitionBy("day").parquet(out); 1L })
    spark.sparkContext.hadoopConfiguration
      .setInt("mapreduce.fileoutputcommitter.algorithm.version", 2)
    time("store write (v2 committer)")({
      sketch.repartition(col("day"))
        .write.mode("overwrite").partitionBy("day").parquet(out); 1L })
    spark.sparkContext.hadoopConfiguration
      .setBoolean("mapreduce.fileoutputcommitter.marksuccessfuljobs", false)
    time("store write (v2 + no _SUCCESS)")({
      sketch.repartition(col("day"))
        .write.mode("overwrite").partitionBy("day").parquet(out); 1L })
    time("store read back + merge")(run(
      spark.read.parquet(out).groupBy(col("event_type"), col("bucket"))
        .agg(sum(col("cnt")), max(col("lo")), max(col("w")))))

    time("FULL gate q_sketch_quantile")(run(
      graft.SparkEntry.queries("q_sketch_quantile")(spark, dir)))
    spark.stop()
  }
}
