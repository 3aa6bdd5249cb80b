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
