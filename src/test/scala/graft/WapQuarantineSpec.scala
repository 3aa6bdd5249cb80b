package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Quarantine, Wap}

/** Local filesystem under a scheme with NO AbstractFileSystem binding —
  * the spec double for an object store where FileContext (and thus atomic
  * Rename.OVERWRITE) is unavailable. */
class GraftLocalFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}

/** Write–Audit–Publish + Quarantine: the divert-don't-abort ingest
  * contract and the atomic snapshot-pointer publish. */
class WapQuarantineSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val rules = Seq(
    Quarantine.Rule("v_pos", col("v") > 0),
    Quarantine.Rule("name_nonnull", col("name").isNotNull))

  test("Quarantine.split: clean + quarantined partition the input; reasons list every violated rule in order") {
    val df = Seq((1, Some("a"), 5), (2, None, 5), (3, Some("c"), -1), (4, None, -2))
      .toDF("id", "name", "v")
    val (good, bad) = Quarantine.split(df, rules)
    assert(good.select("id").as[Int].collect().toSet == Set(1))
    val reasons = bad.select("id", "quarantine_reasons").as[(Int, String)].collect().toMap
    assert(reasons == Map(2 -> "name_nonnull", 3 -> "v_pos", 4 -> "v_pos,name_nonnull"))
    assert(good.count() + bad.count() == df.count())
    // null predicate counts as violation (NA semantics), never as pass
    val nullRow = Seq((9, Some("z"), Option.empty[Int])).toDF("id", "name", "v")
    val (_, badNull) = Quarantine.split(nullRow.select(col("id"), col("name"),
      col("v").cast("int").as("v")), rules)
    assert(badNull.count() == 1)
  }

  test("WAP: audit gate blocks a bad snapshot — production pointer untouched; good snapshot publishes atomically") {
    val root = "/tmp/graft_wap_spec"
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    f.delete(new org.apache.hadoop.fs.Path(root), true)

    // v1: clean — stages, audits clean, publishes
    val v1 = Seq((1, Some("a"), 5), (2, Some("b"), 7)).toDF("id", "name", "v")
    Wap.stage(spark, root, "v1", v1)
    assert(Wap.currentLabel(spark, root).isEmpty, "staging must not be visible")
    Wap.publish(spark, root, "v1", rules)
    assert(Wap.currentLabel(spark, root).contains("snap-v1"))
    assert(Wap.readCurrent(spark, root).count() == 2)

    // v2: contains violations — stage succeeds, publish refuses, readers
    // stay on v1, staged files remain for inspection
    val v2 = Seq((1, Some("a"), 5), (3, None, -1)).toDF("id", "name", "v")
    Wap.stage(spark, root, "v2", v2)
    assert(Wap.audit(spark, root, "v2", rules) == 1L)
    val e = intercept[IllegalArgumentException] { Wap.publish(spark, root, "v2", rules) }
    assert(e.getMessage.contains("not publishing"))
    assert(Wap.currentLabel(spark, root).contains("snap-v1"), "failed audit must not move the pointer")
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$root/snap-v2")), "staged files parked for inspection")

    // v3: clean — publishes over v1; v1 files remain for rollback
    val v3 = Seq((1, Some("a"), 5), (2, Some("b"), 7), (4, Some("d"), 9)).toDF("id", "name", "v")
    Wap.stage(spark, root, "v3", v3)
    Wap.publish(spark, root, "v3", rules)
    assert(Wap.currentLabel(spark, root).contains("snap-v3"))
    assert(Wap.readCurrent(spark, root).count() == 3)
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$root/snap-v1")), "superseded snapshot retained for rollback")
  }

  test("time travel: versions assign in publish order, veto consumes none, AS OF reads every past version, re-publish is idempotent") {
    val root = "/tmp/graft_wap_tt_spec"
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    f.delete(new org.apache.hadoop.fs.Path(root), true)

    val v1 = Seq((1, Some("a"), 5)).toDF("id", "name", "v")
    val v2 = Seq((1, Some("a"), 5), (2, Some("b"), 7)).toDF("id", "name", "v")
    Wap.stage(spark, root, "v1", v1)
    assert(Wap.publishVersioned(spark, root, "v1", rules) == 1L)
    Wap.stage(spark, root, "v2", v2)
    assert(Wap.publishVersioned(spark, root, "v2", rules) == 2L)

    // a vetoed snapshot must not occupy a version
    val bad = Seq((3, Option.empty[String], -1)).toDF("id", "name", "v")
    Wap.stage(spark, root, "bad", bad)
    intercept[IllegalArgumentException] { Wap.publishVersioned(spark, root, "bad", rules) }
    assert(Wap.history(spark, root) == Seq((1L, "snap-v1"), (2L, "snap-v2")))

    // AS OF resolves every logged version; current = latest
    assert(Wap.readAsOf(spark, root, 1L).count() == 1)
    assert(Wap.readAsOf(spark, root, 2L).count() == 2)
    assert(Wap.currentLabel(spark, root).contains("snap-v2"))
    intercept[IllegalArgumentException] { Wap.readAsOf(spark, root, 9L) }

    // crash-recovery idempotence: re-publishing a logged label reuses its
    // version and appends nothing
    assert(Wap.publishVersioned(spark, root, "v1", rules) == 1L)
    assert(Wap.history(spark, root).map(_._1) == Seq(1L, 2L))
    assert(Wap.currentLabel(spark, root).contains("snap-v1"), "re-publish swings the pointer (rollback via republish)")
  }

  test("publish falls back to delete-then-rename when FileContext rejects the scheme (object-store shape)") {
    // graftfs:// resolves a FileSystem (fs.graftfs.impl below) but has NO
    // AbstractFileSystem binding, so FileContext.getFileContext throws
    // UnsupportedFileSystemException (an IOException) — the exact shape of
    // an object-store binding without atomic rename. Publish must route to
    // the delete-then-rename fallback instead of stranding the tmp pointer.
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftfs.impl", classOf[GraftLocalFs].getName)
    intercept[java.io.IOException] { // prove the FileContext path is closed
      org.apache.hadoop.fs.FileContext.getFileContext(
        java.net.URI.create("graftfs:///"), spark.sessionState.newHadoopConf())
    }
    val root = "graftfs:///tmp/graft_wap_fallback_spec"
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    f.delete(new org.apache.hadoop.fs.Path(root), true)

    val v1 = Seq((1, Some("a"), 5)).toDF("id", "name", "v")
    Wap.stage(spark, root, "v1", v1)
    Wap.publish(spark, root, "v1", rules) // first publish: no pointer yet
    assert(Wap.currentLabel(spark, root).contains("snap-v1"))
    val v2 = Seq((1, Some("a"), 5), (2, Some("b"), 7)).toDF("id", "name", "v")
    Wap.stage(spark, root, "v2", v2)
    Wap.publish(spark, root, "v2", rules) // re-publish: delete + rename path
    assert(Wap.currentLabel(spark, root).contains("snap-v2"))
    assert(Wap.readCurrent(spark, root).count() == 2)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$root/current.tmp")),
      "fallback must consume the tmp pointer, not strand it")
  }

  test("e_quarantine gate: reasons are deterministic and every lineitem row is either clean or diverted") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.Etl2.eQuarantine(spark, dir)
    val n = out.count()
    assert(n > 0, "fixture rules must fire")
    assert(out.filter(col("quarantine_reasons").isNull || col("quarantine_reasons") === "").count() == 0)
    // quarantined + clean = corpus
    val total = Tables.lineitem(spark, dir).count()
    val (good, bad) = Quarantine.split(Tables.lineitem(spark, dir), Seq(
      Quarantine.Rule("qty_le_25", col("l_quantity") <= 25),
      Quarantine.Rule("discount_le_5pct", col("l_discount") <= 0.05),
      Quarantine.Rule("price_positive", col("l_extendedprice") > 0)))
    assert(good.count() + bad.count() == total)
    assert(bad.count() == n)
  }
}
