package graft.tools

import java.sql.DriverManager

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.JdbcUpsertSink
import graft.sources.JdbcUpsertSink.Config

/** End-to-end drive of the JDBC upsert sink against embedded Derby:
  * load customers, stage+merge them, re-merge a mutated batch, print the
  * resulting table state. Run: sbt "runMain graft.tools.JdbcDemo". */
object JdbcDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val url = "jdbc:derby:memory:demodb;create=true"
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")

    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_acctbal"))
    val conn = DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      JdbcUpsertSink.ddl("customer_t", cust.schema, Seq("c_custkey")))
    conn.close()

    JdbcUpsertSink.upsertViaStaging(cust, Config(url, "customer_t", Seq("c_custkey")))
    val mutated = cust.withColumn("c_mktsegment",
      when(col("c_custkey") % 7 === 0, lit("PROMO")).otherwise(col("c_mktsegment")))
    JdbcUpsertSink.upsertViaStaging(mutated, Config(url, "customer_t", Seq("c_custkey")))

    val c2 = DriverManager.getConnection(url)
    val rs = c2.createStatement().executeQuery(
      "SELECT c_mktsegment, COUNT(*) FROM customer_t GROUP BY c_mktsegment ORDER BY c_mktsegment")
    while (rs.next()) println(s"${rs.getString(1)}: ${rs.getLong(2)}")
    val rs2 = c2.createStatement().executeQuery("SELECT COUNT(*) FROM customer_t")
    rs2.next(); println(s"total rows: ${rs2.getLong(1)} (source had ${cust.count()})")
    c2.close()
    spark.stop()
  }
}
