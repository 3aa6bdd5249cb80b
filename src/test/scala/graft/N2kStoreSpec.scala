package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.N2kBinding

/** The concrete n2kresult binding against a real database: all fourteen
  * tables (7 dims, 2 links, analysis/anomaly/observation/result facts and
  * the analysis_dataset link) land FK-first in ONE transaction, a
  * mid-transaction death makes NOTHING visible, and a plain retry
  * converges — the reference's single-DBI-transaction contract over the
  * whole graph, not just one dim+fact pair. */
class N2kStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val url = "jdbc:derby:memory:n2kdb;create=true"
  private val dir = "/root/testdata/sf0.001"

  private def ddlFor(t: N2kBinding.Table): String = {
    val cols = (t.keyCols ++ t.attrCols).map { c =>
      val ty = c match {
        case "ds_key" | "sp_key" | "n_items" | "n_returned" | "n_obs" | "n_est" => "BIGINT"
        case "ship_yr" | "loc_key" | "lg_key" | "dset_key" => "INT"
        case "revenue" | "estimate" => "DOUBLE"
        case _ => "VARCHAR(200)"
      }
      s"$c $ty"
    }
    val stamps =
      if (t.stamped) Seq("first_imported BIGINT", "last_imported BIGINT", "despawned BOOLEAN")
      else Nil
    s"CREATE TABLE n2k_${t.name} (${(cols ++ stamps).mkString(", ")}, " +
      s"PRIMARY KEY (${t.keyCols.mkString(", ")}))"
  }

  private def count(table: String): Int = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(s"SELECT COUNT(*) FROM $table")
      rs.next(); rs.getInt(1)
    } finally c.close()
  }

  private def despawnedCount(table: String): Int = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(
        s"SELECT COUNT(*) FROM $table WHERE despawned")
      rs.next(); rs.getInt(1)
    } finally c.close()
  }

  test("importPairSummaryFused (single union job) is value-identical to the pooled path") {
    import org.apache.spark.sql.functions.col
    val w1 = N2kBinding.window(spark, dir, "1996-01-01", "1998-01-01")
    val w2 = N2kBinding.window(spark, dir, "1997-01-01", "1999-01-01")
    val pooled = N2kBinding.importPairSummary(w1, w2).collect().toSeq
    val fused = N2kBinding.importPairSummaryFused(w1, w2).collect().toSeq
    assert(pooled.nonEmpty)
    assert(fused == pooled,
      "the one-job union variant must produce the identical summary frame")
    // and the fused path still enforces validation via its observe() ride
    val broken = w1.withColumn("sg_brand",
      org.apache.spark.sql.functions.when(col("l_partkey") % 97 === 0, null)
        .otherwise(col("sg_brand")))
    val e = intercept[Exception](N2kBinding.importPairSummaryFused(broken, w2))
    assert(e.getMessage.contains("validation failed"), s"got: ${e.getMessage}")
  }

  test("whole-graph store: mid-transaction death leaves all 14 tables empty; retry converges; despawn lands") {
    val conn = DriverManager.getConnection(url)
    try {
      for (t <- N2kBinding.Graph) {
        try conn.createStatement().executeUpdate(s"DROP TABLE n2k_${t.name}")
        catch { case _: Exception => () }
        conn.createStatement().executeUpdate(ddlFor(t))
      }
    } finally conn.close()

    val w1 = N2kBinding.window(spark, dir, "1996-01-01", "1998-01-01").localCheckpoint()
    val w2 = N2kBinding.window(spark, dir, "1997-01-01", "1999-01-01").localCheckpoint()
    val st0 = N2kBinding.Graph.map(t => t.name -> N2kBinding.emptyState(t, w1)).toMap
    val st1 = N2kBinding.importAll(st0, w1, stamp = 1L)

    // kill the single transaction AFTER all seven dim merges and both
    // link merges ran, BEFORE the fact merges commit — the worst partial
    // state
    val ex = intercept[RuntimeException] {
      N2kBinding.storeAll(st1, url,
        onMergeStepForTest = i => if (i == 9) throw new RuntimeException("injected crash"))
    }
    assert(ex.getMessage == "injected crash")
    for (t <- N2kBinding.Graph)
      assert(count(s"n2k_${t.name}") == 0,
        s"n2k_${t.name} must be empty after the rollback — no partial import visible")

    // plain retry of the same call converges (idempotent staging + MERGE)
    N2kBinding.storeAll(st1, url)
    val counts1 = N2kBinding.Graph.map(t => t.name -> count(s"n2k_${t.name}")).toMap
    for (t <- N2kBinding.Graph) {
      val expected = st1(t.name).count().toInt
      assert(counts1(t.name) == expected,
        s"n2k_${t.name}: ${counts1(t.name)} rows in DB, expected $expected")
      assert(counts1(t.name) > 0, s"n2k_${t.name} must not be empty at sf0.001")
    }

    // and re-running the SAME import against the database state is a no-op
    N2kBinding.storeAll(st1, url)
    for (t <- N2kBinding.Graph)
      assert(count(s"n2k_${t.name}") == counts1(t.name))

    // import 2: the shifted window — despawns must land as soft-delete
    // UPDATEs (rows kept), inserts/updates as new content
    val st2 = N2kBinding.importAll(st1, w2, stamp = 2L)
    N2kBinding.storeAll(st2, url)
    var totalDespawned = 0
    for (t <- N2kBinding.Graph if t.stamped) {
      val merged = st2(t.name)
      val expectedRows = merged.count().toInt // full history: old + new keys
      assert(count(s"n2k_${t.name}") == expectedRows,
        s"n2k_${t.name}: despawn must keep rows, never delete")
      val expectedDespawned = merged.filter(col("despawned")).count().toInt
      assert(despawnedCount(s"n2k_${t.name}") == expectedDespawned)
      totalDespawned += expectedDespawned
    }
    // the year the shift drops must despawn at least the year-keyed facts
    // (the link table may legitimately see every pair recur at sf0.001)
    assert(totalDespawned > 0, "the shifted window must despawn something")
  }
}
