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
}
