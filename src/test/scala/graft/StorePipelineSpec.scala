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

  test("stamped store: despawn soft-deletes in the database, stamps maintained, respawn clears") {
    val conn = DriverManager.getConnection(url)
    try {
      try conn.createStatement().executeUpdate("DROP TABLE cust_s") catch { case _: Exception => () }
      conn.createStatement().executeUpdate(
        """CREATE TABLE cust_s (c_custkey BIGINT PRIMARY KEY, c_name VARCHAR(100),
          |  seg_sk VARCHAR(64), first_imported BIGINT, last_imported BIGINT,
          |  despawned BOOLEAN)""".stripMargin.replace("\n", " "))
    } finally conn.close()

    def dbRows(): Map[Long, (String, Long, Long, Boolean)] = {
      val c = DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery(
          "SELECT c_custkey, c_name, first_imported, last_imported, despawned FROM cust_s")
        Iterator.continually(rs).takeWhile(_.next())
          .map(r => r.getLong(1) -> ((r.getString(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
          .toMap
      } finally c.close()
    }

    // import 1: two fresh rows at stamp 1
    val empty = Seq.empty[(Long, String, String, Long, Long, Boolean)]
      .toDF("c_custkey", "c_name", "c_mktsegment", "first_imported", "last_imported", "despawned")
    val in1 = Seq((1L, "a", "BUILDING"), (2L, "b", "AUTO")).toDF("c_custkey", "c_name", "c_mktsegment")
    StorePipeline.storeAndWrite(spark, empty, in1, spec, url, "cust_s", stamp = Some(lit(1L)))
    assert(dbRows() == Map(1L -> (("a", 1L, 1L, false)), 2L -> (("b", 1L, 1L, false))))

    // import 2 at stamp 2: key 1 absent from the batch → soft-deleted in
    // the DB (NOT dropped), its stamps frozen; key 2 present unchanged →
    // last_imported refreshed
    val cur2 = Seq((1L, "a", "BUILDING", 1L, 1L, false), (2L, "b", "AUTO", 1L, 1L, false))
      .toDF("c_custkey", "c_name", "c_mktsegment", "first_imported", "last_imported", "despawned")
    val in2 = Seq((2L, "b", "AUTO")).toDF("c_custkey", "c_name", "c_mktsegment")
    val r2 = StorePipeline.storeAndWrite(spark, cur2, in2, spec, url, "cust_s", stamp = Some(lit(2L)))
    assert(r2.merged.filter(col("action") === UpsertMerge.Despawn).count() == 1)
    assert(dbRows() == Map(1L -> (("a", 1L, 1L, true)), 2L -> (("b", 1L, 2L, false))))

    // import 3 at stamp 3: key 1 reappears unchanged → respawn must reach
    // the DB (flag cleared, last refreshed) even though attributes are equal
    val cur3 = Seq((1L, "a", "BUILDING", 1L, 1L, true), (2L, "b", "AUTO", 1L, 2L, false))
      .toDF("c_custkey", "c_name", "c_mktsegment", "first_imported", "last_imported", "despawned")
    StorePipeline.storeAndWrite(spark, cur3, in1, spec, url, "cust_s", stamp = Some(lit(3L)))
    assert(dbRows() == Map(1L -> (("a", 1L, 3L, false)), 2L -> (("b", 1L, 3L, false))))
  }

  test("cross-table atomicity: a death between the dim and fact merges leaves NOTHING visible; retry converges") {
    // the reference wraps dims + facts in ONE DBI transaction — prove the
    // Spark-side flow keeps that contract under a mid-transaction crash
    val conn = DriverManager.getConnection(url)
    try {
      for (t <- Seq("seg_d", "cust_x"))
        try conn.createStatement().executeUpdate(s"DROP TABLE $t") catch { case _: Exception => () }
      conn.createStatement().executeUpdate(
        "CREATE TABLE seg_d (c_mktsegment VARCHAR(100), seg_sk VARCHAR(64) PRIMARY KEY)")
      conn.createStatement().executeUpdate(
        "CREATE TABLE cust_x (c_custkey BIGINT PRIMARY KEY, c_name VARCHAR(100), seg_sk VARCHAR(64))")
    } finally conn.close()

    def count(table: String): Int = {
      val c = DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery(s"SELECT COUNT(*) FROM $table")
        rs.next(); rs.getInt(1)
      } finally c.close()
    }

    val current = Seq.empty[(Long, String, String)].toDF("c_custkey", "c_name", "c_mktsegment")
    val incoming = Seq((1L, "a", "BUILDING"), (2L, "b", "AUTO")).toDF("c_custkey", "c_name", "c_mktsegment")
    val dimTables = Map("seg_sk" -> "seg_d")

    // crash AFTER the dim merge statement ran, BEFORE the fact merge/commit
    val ex = intercept[RuntimeException] {
      StorePipeline.storeAndWrite(spark, current, incoming, spec, url, "cust_x",
        dimTables = dimTables,
        onMergeStepForTest = i => if (i == 0) throw new RuntimeException("injected crash"))
    }
    assert(ex.getMessage == "injected crash")
    // rollback must have erased the already-executed dim merge too: no
    // partial import is ever visible in EITHER table
    assert(count("seg_d") == 0 && count("cust_x") == 0)

    // plain retry of the same call (the recovery story) converges
    StorePipeline.storeAndWrite(spark, current, incoming, spec, url, "cust_x", dimTables = dimTables)
    assert(count("seg_d") == 2 && count("cust_x") == 2)
    // staging scratch is cleaned up after the commit
    val c2 = DriverManager.getConnection(url)
    try {
      for (st <- Seq("seg_d_staging", "cust_x_staging")) {
        val rs = c2.getMetaData.getTables(null, null, st.toUpperCase, null)
        assert(!rs.next(), s"$st still exists after commit")
      }
    } finally c2.close()

    // and replaying the converged import is a no-op (idempotent recovery)
    val populated = incoming
    StorePipeline.storeAndWrite(spark, populated, incoming, spec, url, "cust_x", dimTables = dimTables)
    assert(count("seg_d") == 2 && count("cust_x") == 2)
  }

  test("curated-corpus manifest: d_curate output flows through a stamped store into JDBC end-to-end") {
    // pillars composed: text quality + fuzzy dedup (C/D) produce the
    // curated set, the store flow (B) lands it as a stamped manifest table;
    // a re-curation that drops documents soft-deletes them, never deletes
    val conn = DriverManager.getConnection(url)
    try {
      try conn.createStatement().executeUpdate("DROP TABLE manifest_t") catch { case _: Exception => () }
      conn.createStatement().executeUpdate(
        """CREATE TABLE manifest_t (doc_id BIGINT PRIMARY KEY, n_tokens INT,
          |  quality DOUBLE, first_imported BIGINT, last_imported BIGINT,
          |  despawned BOOLEAN)""".stripMargin.replace("\n", " "))
    } finally conn.close()

    val mSpec = StorePipeline.Spec(
      keyCols = Seq("doc_id"), attrCols = Seq("n_tokens", "quality"),
      rules = Seq(Validate.Rule("quality_above_cutoff",
        col("quality") >= graft.queries.DedupQ.CurateQuality)))
    def manifest(): Map[Long, (Long, Boolean)] = {
      val c = DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery(
          "SELECT doc_id, last_imported, despawned FROM manifest_t")
        Iterator.continually(rs).takeWhile(_.next())
          .map(r => r.getLong(1) -> ((r.getLong(2), r.getBoolean(3)))).toMap
      } finally c.close()
    }
    def readBack(): org.apache.spark.sql.DataFrame = {
      val raw = spark.read.format("jdbc")
        .option("url", url).option("dbtable", "manifest_t").load()
      raw.toDF(raw.columns.map(_.toLowerCase): _*) // Derby upcases identifiers
    }

    // import 1: the real curation pipeline output at sf0.001
    val curated = graft.queries.DedupQ.dCurate(spark, "/root/testdata/sf0.001").localCheckpoint()
    val nCurated = curated.count()
    assert(nCurated > 0)
    val empty = Seq.empty[(Long, Int, Double, Long, Long, Boolean)]
      .toDF("doc_id", "n_tokens", "quality", "first_imported", "last_imported", "despawned")
    StorePipeline.storeAndWrite(spark, empty, curated, mSpec, url, "manifest_t",
      stamp = Some(lit(1L)))
    assert(manifest().size == nCurated.toInt)
    assert(manifest().values.forall(_ == ((1L, false))))

    // import 2: re-curation dropped the docs with doc_id >= 400 (corpus
    // shrank) — those become despawned manifest rows, survivors refresh
    val curated2 = curated.filter(col("doc_id") < 400)
    val dropped = nCurated - curated2.count()
    assert(dropped > 0, "test needs a non-empty drop set")
    StorePipeline.storeAndWrite(spark, readBack(), curated2, mSpec, url, "manifest_t",
      stamp = Some(lit(2L)))
    val m2 = manifest()
    assert(m2.size == nCurated.toInt, "despawn must keep rows, not drop them")
    assert(m2.count(_._2._2) == dropped.toInt)
    assert(m2.filter(!_._2._2).values.forall(_ == ((2L, false))))
    assert(m2.filter(_._2._2).values.forall(_ == ((1L, true))), "despawned stamps frozen")
  }

  test("snapshot-stream ingestion: foreachBatch drives stamped imports, batch id as the import stamp") {
    // each micro-batch is a FULL snapshot export (the import shape despawn
    // semantics are defined for) — the current DB state reads back through
    // JDBC inside each batch, so the stream is its own feedback loop
    val conn = DriverManager.getConnection(url)
    try {
      try conn.createStatement().executeUpdate("DROP TABLE snap_t") catch { case _: Exception => () }
      conn.createStatement().executeUpdate(
        """CREATE TABLE snap_t (user_id BIGINT PRIMARY KEY, amount DOUBLE,
          |  first_imported BIGINT, last_imported BIGINT, despawned BOOLEAN)""".stripMargin.replace("\n", " "))
    } finally conn.close()

    val snapSpec = StorePipeline.Spec(keyCols = Seq("user_id"), attrCols = Seq("amount"))
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Double)]
    val q = ms.toDF().toDF("user_id", "amount").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val raw = spark.read.format("jdbc")
          .option("url", url).option("dbtable", "snap_t").load()
        val current = raw.toDF(raw.columns.map(_.toLowerCase): _*) // Derby upcases identifiers
        StorePipeline.storeAndWrite(spark, current, batch, snapSpec, url, "snap_t",
          stamp = Some(lit(id)))
        ()
      }.start()
    def rows(): Map[Long, (Double, Long, Long, Boolean)] = {
      val c = DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery(
          "SELECT user_id, amount, first_imported, last_imported, despawned FROM snap_t")
        Iterator.continually(rs).takeWhile(_.next())
          .map(r => r.getLong(1) -> ((r.getDouble(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
          .toMap
      } finally c.close()
    }
    try {
      ms.addData((1L, 10.0), (2L, 20.0))   // snapshot 0: two users
      q.processAllAvailable()
      assert(rows() == Map(1L -> ((10.0, 0L, 0L, false)), 2L -> ((20.0, 0L, 0L, false))))
      ms.addData((2L, 25.0))               // snapshot 1: user 1 gone, user 2 changed
      q.processAllAvailable()
      assert(rows() == Map(1L -> ((10.0, 0L, 0L, true)), 2L -> ((25.0, 0L, 1L, false))))
    } finally q.stop()
  }
}
