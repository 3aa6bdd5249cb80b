package graft.sources

import org.apache.spark.sql.DataFrame

/** Output-layout management — at 100 TB the write layout IS the read plan:
  * partition columns become partition-pruned directories, zstd keeps scan
  * bytes down, and bounded file sizes keep task planning sane.
  */
object Writers {

  /** Hive-style partitioned parquet: reads filtered on `partitionCols`
    * touch only matching directories (PartitionFilters, no data read). */
  def partitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L): Unit =
    df.write
      .mode("overwrite")
      .option("compression", "zstd")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Sorted-within-partitions parquet: co-sorted files make min/max row
    * group statistics selective for range predicates on `sortCols`. */
  def sortedParquet(df: DataFrame, path: String, sortCols: Seq[String]): Unit =
    df.sortWithinPartitions(sortCols.head, sortCols.tail: _*)
      .write.mode("overwrite")
      .option("compression", "zstd")
      .parquet(path)

  /** Point-lookup layout: parquet split-block bloom filters on
    * high-cardinality key columns. Min/max row-group stats prune RANGE
    * predicates on clustered columns ([[sortedParquet]], [[ZOrder]]); for
    * `key = x` probes on columns with no exploitable order (ids, hashes,
    * urls) the bloom filter is the only footer-level skip available — a
    * reader consults it per row group and skips groups that provably lack
    * the key, regardless of layout. `bloomCols` maps each column to its
    * expected distinct count per row group, which sizes the filter
    * (parquet-mr derives bits from ndv at its default 1% fpp). */
  def bloomFilteredParquet(df: DataFrame, path: String,
      bloomCols: Map[String, Long], sortCols: Seq[String] = Nil): Unit = {
    val shaped =
      if (sortCols.nonEmpty) df.sortWithinPartitions(sortCols.head, sortCols.tail: _*) else df
    val opts = bloomCols.flatMap { case (c, ndv) => Seq(
      s"parquet.bloom.filter.enabled#$c" -> "true",
      s"parquet.bloom.filter.expected.ndv#$c" -> ndv.toString)
    }
    shaped.write.mode("overwrite")
      .option("compression", "zstd")
      .options(opts)
      .parquet(path)
  }

  /** Small-file compaction — incremental pipelines (streaming sinks, per-
    * batch appends, over-parallel writes) accrete files far below the HDFS/
    * object-store sweet spot; at 100 TB that means millions of scan tasks
    * and NameNode/listing pressure. Rewrite `path` into ceil(bytes/target)
    * files (zstd), optionally re-clustered on `sortCols` so row-group
    * min/max stats stay selective after the merge.
    *
    * Commit protocol is rename-based, same as IvfIndex.append: write to a
    * `_compact_tmp` sibling, swap directories, drop the old data last. A
    * crash before the swap leaves the original untouched; a crash between
    * the two renames leaves `_compact_old` behind for manual recovery but
    * never a half-written live directory.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024, sortCols: Seq[String] = Nil): Int = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hPath).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(path)
    val shaped =
      if (sortCols.nonEmpty)
        df.repartitionByRange(nFiles, sortCols.map(df(_)): _*)
          .sortWithinPartitions(sortCols.head, sortCols.tail: _*)
      else df.coalesce(nFiles)
    val tmp = new org.apache.hadoop.fs.Path(path + "_compact_tmp")
    val old = new org.apache.hadoop.fs.Path(path + "_compact_old")
    fs.delete(tmp, true); fs.delete(old, true)
    shaped.write.mode("overwrite").option("compression", "zstd").parquet(tmp.toString)
    if (!fs.rename(hPath, old)) sys.error(s"compact: cannot stage out $path")
    if (!fs.rename(tmp, hPath)) {
      // the recovery rename can itself fail — say so, or the caller
      // believes the original is intact when it sits in _compact_old
      val restored = fs.rename(old, hPath)
      sys.error(s"compact: swap failed for $path" +
        (if (restored) " (original restored)"
         else s" AND restore failed — data is in ${old}"))
    }
    fs.delete(old, true)
    nFiles
  }
}
