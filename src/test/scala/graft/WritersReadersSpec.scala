package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Readers, Writers}

class WritersReadersSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("partitionedParquet: reads on the partition column prune to matching directories") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumn("o_year", year(col("o_orderdate")))
    Writers.partitionedParquet(orders, out, Seq("o_year"))
    val filtered = spark.read.parquet(out).filter(col("o_year") === 1997)
    filtered.collect()
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("o_year"), scan.take(1500))
    // pruning must not lose rows
    val expected = orders.filter(year(col("o_orderdate")) === 1997).count()
    assert(filtered.count() == expected)
  }

  test("Readers.jdbcPartitioned: parallel range read is complete, including rows outside the bound estimates") {
    val url = "jdbc:derby:memory:jdbcpart;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      try conn.createStatement().executeUpdate("DROP TABLE wide_t") catch { case _: Exception => () }
      conn.createStatement().executeUpdate(
        "CREATE TABLE wide_t (id BIGINT PRIMARY KEY, v VARCHAR(20))")
      val ps = conn.prepareStatement("INSERT INTO wide_t VALUES (?, ?)")
      for (i <- 1L to 1000L) { ps.setLong(1, i); ps.setString(2, s"row$i"); ps.addBatch() }
      ps.executeBatch()
    } finally conn.close()
    // bounds deliberately WRONG (cover only 200..800): first/last partition
    // ranges are unbounded, so every row must still arrive
    val df = Readers.jdbcPartitioned(spark, url, "wide_t", "id", 200L, 800L, 4)
    assert(df.rdd.getNumPartitions == 4, "read must split into the requested ranges")
    assert(df.count() == 1000)
    val ids = df.agg(min(col("ID")), max(col("ID"))).as[(Long, Long)].head()
    assert(ids == ((1L, 1000L)))
  }

  test("Readers.csv FAILFAST dies loudly on malformed rows instead of nulling") {
    val dir = java.nio.file.Files.createTempDirectory("graft-badcsv")
    java.nio.file.Files.writeString(dir.resolve("bad.csv"),
      "k,v\n1,ok\nnot_a_number,boom\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    val ex = intercept[org.apache.spark.SparkException] {
      Readers.csv(spark, dir.toString, schema).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed") ||
      ex.getCause != null, ex.getMessage.take(300))
  }

  test("Readers.jsonQuarantine routes malformed rows to _corrupt_record, keeps clean rows typed") {
    val dir = java.nio.file.Files.createTempDirectory("quarantine")
    java.nio.file.Files.writeString(dir.resolve("feed.json"),
      """{"k": 1, "v": "ok"}
        |{not json at all
        |{"k": 2, "v": "fine"}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    // caching first is the documented Spark contract for reading the
    // corrupt-record column (the raw record must be retained)
    val df = graft.sources.Readers.jsonQuarantine(spark, dir.toString, schema).cache()
    val clean = df.filter(org.apache.spark.sql.functions.col("_corrupt_record").isNull)
    val quarantined = df.filter(org.apache.spark.sql.functions.col("_corrupt_record").isNotNull)
    assert(clean.select("k").as[Int].collect().sorted.toSeq == Seq(1, 2))
    assert(quarantined.count() == 1)
    assert(quarantined.select("_corrupt_record").as[String].head().contains("not json"))
    df.unpersist()
  }

  test("Writers.compact: shrinks a many-small-files layout without changing content, leaving no staging residue") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").resolve("t").toString
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    orders.repartition(64).write.parquet(dir)
    def dataFiles() = new java.io.File(dir).listFiles.count(_.getName.endsWith(".parquet"))
    assert(dataFiles() == 64)
    val before = spark.read.parquet(dir).agg(
      count(lit(1)), sum(col("o_orderkey")), sum(col("o_custkey"))).head()

    val n = Writers.compact(spark, dir, targetBytes = 1024L * 1024 * 1024)
    assert(n == 1 && dataFiles() == 1, s"expected 1 compacted file, got ${dataFiles()}")
    assert(spark.read.parquet(dir).agg(
      count(lit(1)), sum(col("o_orderkey")), sum(col("o_custkey"))).head() == before)
    // no staging residue after a clean swap
    val parent = new java.io.File(dir).getParentFile.listFiles.map(_.getName).toSet
    assert(!parent.exists(_.contains("_compact_")), parent.toString)

    // re-clustered variant keeps content and sorts within the file
    Writers.compact(spark, dir, targetBytes = 1024L * 1024 * 1024, sortCols = Seq("o_orderkey"))
    val keys = spark.read.parquet(dir).select("o_orderkey").as[Long].collect()
    assert(keys.sameElements(keys.sorted), "sortCols compaction must leave keys ordered")
  }

  test("Readers.parquet rejects files missing expected columns") {
    val ex = intercept[IllegalArgumentException] {
      Readers.parquet(spark, "/root/testdata/sf0.001/region.parquet",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("missing_col", org.apache.spark.sql.types.StringType))))
    }
    assert(ex.getMessage.contains("missing_col"))
  }
}
