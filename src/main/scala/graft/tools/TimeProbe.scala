package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.dedup.{Dedup, MinHashLsh}

/** Micro-timing of the LSH/jaccard pipeline stages. */
object TimeProbe {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $name"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    time("warmup count")(docs.count())
    time("signatures")(MinHashLsh.signatures(docs, "doc_id", "text").queryExecution.toRdd.count())
    time("signatures again")(MinHashLsh.signatures(docs, "doc_id", "text").queryExecution.toRdd.count())
    time("candidatePairs")(MinHashLsh.candidatePairs(docs, "doc_id", "text").queryExecution.toRdd.count())
    val cands = time("cands persist")(
      { val c = MinHashLsh.candidatePairs(docs, "doc_id", "text").persist(); c.count(); c })
    time("jaccardOnPairs(after cache)")(
      Dedup.jaccardOnPairs(cands, docs, "doc_id", "text").queryExecution.toRdd.count())
    spark.stop()
  }
}
