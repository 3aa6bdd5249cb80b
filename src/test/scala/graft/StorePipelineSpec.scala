package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{StorePipeline, UpsertMerge, Validate}
import graft.sources.JdbcUpsertSink

/** End-to-end store_* contract: validate → key → normalize → merge → JDBC,
  * driven twice to prove idempotency (the reference's core guarantee). */
class StorePipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val url = "jdbc:derby:memory:storedb;create=true"

  private val spec = StorePipeline.Spec(
    keyCols = Seq("c_custkey"),
    attrCols = Seq("c_name"),
    dims = Seq("seg_sk" -> Seq("c_mktsegment")),
    rules = Seq(Validate.Rule("key_nonnull", col("c_custkey").isNotNull)))

  test("store: validates, extracts dims, classifies the merge") {
    val current = Seq((1L, "a", "BUILDING"), (2L, "b", "AUTO")).toDF("c_custkey", "c_name", "c_mktsegment")
    val incoming = Seq((2L, "b2", "AUTO"), (3L, "c", "BUILDING")).toDF("c_custkey", "c_name", "c_mktsegment")
    val r = StorePipeline.store(spark, current, incoming, spec)
    assert(r.dims("seg_sk").count() == 2)
    val actions = r.merged.select("c_custkey", "action").as[(Long, String)].collect().toMap
    assert(actions == Map(1L -> "keep", 2L -> "update", 3L -> "insert"))
  }

  test("store: strict mode throws on validation failure") {
    val current = Seq((1L, "a", "B")).toDF("c_custkey", "c_name", "c_mktsegment")
    val incoming = Seq((Option.empty[Long], "x", "B")).toDF("c_custkey", "c_name", "c_mktsegment")
    val ex = intercept[IllegalArgumentException] {
      StorePipeline.store(spark, current, incoming, spec)
    }
    assert(ex.getMessage.contains("key_nonnull"))
  }

  test("storeAndWrite is idempotent against the database") {
    val conn = DriverManager.getConnection(url)
    try {
      try conn.createStatement().executeUpdate("DROP TABLE cust_t") catch { case _: Exception => () }
      conn.createStatement().executeUpdate(
        "CREATE TABLE cust_t (c_custkey BIGINT PRIMARY KEY, c_name VARCHAR(100), seg_sk VARCHAR(64))")
    } finally conn.close()

    val current = Seq.empty[(Long, String, String)].toDF("c_custkey", "c_name", "c_mktsegment")
    val incoming = Seq((1L, "a", "BUILDING"), (2L, "b", "AUTO")).toDF("c_custkey", "c_name", "c_mktsegment")
    val r1 = StorePipeline.storeAndWrite(spark, current, incoming, spec, url, "cust_t")
    assert(r1.merged.filter(col("action") === UpsertMerge.Insert).count() == 2)

    def rows(): Seq[(Long, String)] = {
      val c = DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery("SELECT c_custkey, c_name FROM cust_t ORDER BY c_custkey")
        Iterator.continually(rs).takeWhile(_.next()).map(r => (r.getLong(1), r.getString(2))).toSeq
      } finally c.close()
    }
    assert(rows() == Seq((1L, "a"), (2L, "b")))
    // replay the same batch against the now-populated table: no-op
    val populated = incoming
    StorePipeline.storeAndWrite(spark, populated, incoming, spec, url, "cust_t")
    assert(rows() == Seq((1L, "a"), (2L, "b")))
  }
}
