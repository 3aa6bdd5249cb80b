package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Manifest

/** The data-skipping manifest: footer stats must equal the real per-file
  * extrema, and the pruning decision must keep every file that can hold a
  * match while dropping the ones that provably cannot. */
class ManifestSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val path = "/tmp/graft_manifest_spec"

  test("manifest equals per-file truth; range pruning drops provably-disjoint files only") {
    // 4 files with disjoint, known o_orderkey ranges: repartitionByRange +
    // sortWithinPartitions gives tight, non-overlapping footer stats
    val src = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    src.repartitionByRange(4, col("o_orderkey"))
      .sortWithinPartitions(col("o_orderkey"))
      .write.mode("overwrite").parquet(path)

    val m = Manifest.collect(spark, path, Seq("o_orderkey", "o_orderstatus")).cache()
    val files = m.select("file").distinct().as[String].collect()
    assert(files.length == 4, s"expected 4 parquet files, got ${files.toSeq}")

    // footer stats == the real scanned min/max and row count, per file
    val truth = spark.read.parquet(path)
      .withColumn("file", regexp_extract(input_file_name(), "([^/]+)$", 1))
      .groupBy("file")
      .agg(count(lit(1)).as("n"), min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    m.filter(col("column") === "o_orderkey").collect().foreach { r =>
      val (n, lo, hi) = truth(r.getString(0))
      assert(r.getLong(1) == n, s"row count drift for ${r.getString(0)}")
      assert(r.getString(3).toLong == lo && r.getString(4).toLong == hi,
        s"stat drift for ${r.getString(0)}: ${r.getString(3)}..${r.getString(4)} vs $lo..$hi")
      assert(r.getLong(5) == 0L, "orderkey has no nulls")
    }

    // pruning: a range inside ONE file's span keeps exactly the files that
    // can intersect, and never drops one that holds matches
    val allRanges = m.filter(col("column") === "o_orderkey")
      .select("file", "min_value", "max_value").collect()
      .map(r => (r.getString(0), r.getString(1).toLong, r.getString(2).toLong))
      .sortBy(_._2)
    val (probeFile, pLo, pHi) = allRanges(1)
    val mid = (pLo + pHi) / 2
    // string-comparable requires equal-width numerics: probe with a range
    // re-encoded at fixed width via the same zero-pad on both sides
    def pad(v: Long) = f"$v%019d"
    val padded = Manifest.collect(spark, path, Seq("o_orderkey"))
      .withColumn("min_value", lpad(col("min_value"), 19, "0"))
      .withColumn("max_value", lpad(col("max_value"), 19, "0"))
    val kept = Manifest.candidateFiles(padded, "o_orderkey", pad(mid), pad(mid))
    assert(kept.contains(probeFile), "pruning must keep the file that holds the key")
    assert(kept.size < 4, "disjoint files must be pruned")
    // completeness: every actually-matching row lives in a kept file
    val hit = spark.read.parquet(path).filter(col("o_orderkey") === mid)
    if (hit.count() > 0) {
      val hitFiles = hit.select(regexp_extract(input_file_name(), "([^/]+)$", 1))
        .distinct().as[String].collect().toSet
      assert(hitFiles.subsetOf(kept.toSet))
    }
  }
}
