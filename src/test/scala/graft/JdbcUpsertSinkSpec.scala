package graft

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JdbcUpsertSink
import graft.sources.JdbcUpsertSink.Config

/** Exercises the staged + direct JDBC upsert paths against embedded Derby
  * (the JDBC engine shipped with Spark — no external DB needed). */
class JdbcUpsertSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def fetchAll(table: String): Map[Int, (String, Double)] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(s"SELECT k, name, val FROM $table ORDER BY k")
      Iterator.continually(rs)
        .takeWhile(_.next())
        .map(r => r.getInt(1) -> (r.getString(2), r.getDouble(3)))
        .toMap
    } finally conn.close()
  }

  private def freshTarget(table: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      try conn.createStatement().executeUpdate(s"DROP TABLE $table") catch { case _: Exception => () }
      conn.createStatement().executeUpdate(
        s"CREATE TABLE $table (k INT PRIMARY KEY, name VARCHAR(100), val DOUBLE)")
      conn.createStatement().executeUpdate(s"INSERT INTO $table VALUES (1, 'one', 1.0), (2, 'two', 2.0)")
    } finally conn.close()
  }

  test("upsertViaStaging: parallel staging + one transactional MERGE, idempotent") {
    freshTarget("t1")
    val batch = Seq((2, "two-v2", 2.5), (3, "three", 3.0)).toDF("k", "name", "val").repartition(3)
    JdbcUpsertSink.upsertViaStaging(batch, Config(url, "t1", Seq("k")))
    assert(fetchAll("t1") == Map(1 -> ("one", 1.0), 2 -> ("two-v2", 2.5), 3 -> ("three", 3.0)))
    // re-running the same batch must be a no-op (reference idempotency)
    JdbcUpsertSink.upsertViaStaging(batch, Config(url, "t1", Seq("k")))
    assert(fetchAll("t1") == Map(1 -> ("one", 1.0), 2 -> ("two-v2", 2.5), 3 -> ("three", 3.0)))
  }

  test("direct per-partition MERGE upsert") {
    freshTarget("t2")
    val batch = Seq((1, "one-v2", 1.5), (4, "four", 4.0)).toDF("k", "name", "val").repartition(2)
    JdbcUpsertSink.upsert(batch, Config(url, "t2", Seq("k"), batchSize = 1))
    assert(fetchAll("t2") == Map(1 -> ("one-v2", 1.5), 2 -> ("two", 2.0), 4 -> ("four", 4.0)))
  }
}
