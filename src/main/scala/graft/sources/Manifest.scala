package graft.sources

import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-statistics manifest from parquet FOOTERS — the data-skipping
  * index a lakehouse table format keeps next to the data (Delta's
  * per-file stats, Iceberg's manifests, Hudi's column ranges): one row
  * per (file, column) with row count and min/max, read from footer
  * metadata WITHOUT scanning a single data page. A query planner (or the
  * ZOrder layout's consumer) prunes files whose [min, max] cannot
  * intersect a predicate before any task launches.
  *
  * Driver-side metadata I/O bounded by file count (parallel footer
  * opens, same discipline as RowCountEstimate); values surface as
  * strings so one manifest schema covers every column type, with the
  * typed comparable left to the consumer (exactly how the public table
  * formats serialize their stats).
  */
object Manifest {

  final case class FileStat(file: String, n_rows: Long, column: String,
      min_value: String, max_value: String, null_count: Long)

  /** Collect the manifest for `columns` over every parquet file of
    * `path`. Statistics aggregate across a file's row groups. */
  def collect(spark: SparkSession, path: String, columns: Seq[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath).sortBy(_.toString)
    import scala.collection.parallel.CollectionConverters._
    val stats = files.toSeq.par.flatMap { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        val fm = r.getFooter.getBlocks.asScala
        val nRows = fm.map(_.getRowCount).sum
        columns.flatMap { c =>
          val colChunks = fm.flatMap(_.getColumns.asScala)
            .filter(_.getPath.toDotString == c)
          val sts = colChunks.map(_.getStatistics).filter(s => s != null && !s.isEmpty)
          if (sts.isEmpty) None
          else {
            // aggregate across row groups with the column's TYPED
            // comparator — lexicographic string aggregation is wrong for
            // numerics (mins {"9","1005"} would yield "1005" and the
            // understated range could prune a file that matches);
            // serialize to string only after the typed winner is chosen
            val ord = Ordering.comparatorToOrdering(
              sts.head.comparator.asInstanceOf[java.util.Comparator[AnyRef]])
            val minS = sts.minBy(_.genericGetMin.asInstanceOf[AnyRef])(ord)
            val maxS = sts.maxBy(_.genericGetMax.asInstanceOf[AnyRef])(ord)
            Some(FileStat(f.getName, nRows, c,
              minS.minAsString, maxS.maxAsString,
              sts.map(_.getNumNulls).sum))
          }
        }
      } finally r.close()
    }.seq
    spark.createDataFrame(spark.sparkContext.parallelize(stats, 1))
      .orderBy("file", "column")
  }

  /** The files whose [min, max] range can intersect [lo, hi] for
    * `column` — the pruning decision itself: scan only these. Stats are
    * serialized as strings; pass the column's SQL type as `castTo` so a
    * numeric column compares numerically ("9" > "1005" as strings, but
    * 9 < 1005 once cast) — the default keeps plain-string semantics. */
  def candidateFiles(manifest: DataFrame, columnName: String,
      lo: String, hi: String, castTo: String = "string"): Seq[String] = {
    import org.apache.spark.sql.functions._
    manifest.filter(col("column") === columnName &&
        col("min_value").cast(castTo) <= lit(hi).cast(castTo) &&
        col("max_value").cast(castTo) >= lit(lo).cast(castTo))
      .select(col("file")).collect().map(_.getString(0)).toSeq
  }
}
