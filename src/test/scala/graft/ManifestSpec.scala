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

  test("multi-row-group numeric stats aggregate TYPED, not lexicographic; castTo prunes numerically") {
    // one file, many row groups, laid out so the numerically-smallest value
    // sits in a LATER group: group mins {1005..., 9...} — the r9 string
    // aggregation picked "1005" (string-min) and understated the range,
    // silently pruning files that held matches
    val mrg = "/tmp/graft_manifest_mrg"
    val pad = "x" * 200
    val vals = (1005L to 20000L) ++ (9L to 999L)
    // per-row-unique payload defeats dictionary encoding, so the writer's
    // buffered size crosses the tiny block size and actually rolls groups
    vals.toDF("k")
      .withColumn("payload", concat(lit(pad), col("k").cast("string")))
      .coalesce(1)
      .write.mode("overwrite")
      .option("parquet.block.size", (256 * 1024).toString)
      .parquet(mrg)
    // precondition: the layout really has several row groups
    val pf = new java.io.File(mrg).listFiles().filter(_.getName.endsWith(".parquet")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(pf.getAbsolutePath),
        spark.sessionState.newHadoopConf()))
    val nGroups = try reader.getFooter.getBlocks.size finally reader.close()
    assert(nGroups > 1, s"test needs multiple row groups, got $nGroups — shrink the block size")
    val m = Manifest.collect(spark, mrg, Seq("k")).cache()
    try {
      assert(m.count() == 1, "single file expected")
      val row = m.collect()(0)
      assert(row.getString(3).toLong == 9L,
        s"typed min across row groups must be 9, got '${row.getString(3)}'")
      assert(row.getString(4).toLong == 20000L,
        s"typed max across row groups must be 20000, got '${row.getString(4)}'")
      // typed pruning: a range the file genuinely intersects keeps it...
      assert(Manifest.candidateFiles(m, "k", "9", "20", castTo = "bigint").size == 1,
        "file holding 9..20 must survive numeric pruning")
      // ...and a provably-disjoint range drops it
      assert(Manifest.candidateFiles(m, "k", "1", "3", castTo = "bigint").isEmpty,
        "range below the file's true min must prune it")
    } finally m.unpersist()
  }
}
