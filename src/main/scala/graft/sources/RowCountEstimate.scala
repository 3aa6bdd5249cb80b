package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Row-count estimates for SIZING KNOBS (IVF centroid grids, SemDedup
  * cluster counts) — places where a few percent of error is irrelevant
  * but a full count() pass before training is a real extra corpus scan
  * at 100 TB.
  *
  * The footer shortcut (sum parquet footer record counts over the
  * source files) is only valid when the frame IS its files: any
  * Filter/Join/Aggregate/generator above the relation changes the row
  * count while leaving inputFiles untouched, so a filtered corpus would
  * overestimate N arbitrarily. estimate() therefore takes the footer
  * path ONLY for a bare file scan (column pruning aside) and falls back
  * to a real count() otherwise.
  */
object RowCountEstimate {

  /** Footers actually read; beyond this the sampled mean scales by file
    * count. 64 footers bound driver-side metadata I/O while sampling far
    * past the per-file row variance of any sane writer. */
  private val SampleFiles = 64

  /** True iff every operator above the relation preserves row count:
    * aliases and attribute-only projections (column pruning) only. */
  private def isBareFileScan(plan: LogicalPlan): Boolean = {
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case a: SubqueryAlias => strip(a.child)
      case pr: Project if pr.projectList.forall(_.isInstanceOf[Attribute]) => strip(pr.child)
      case other => other
    }
    strip(plan) match {
      case _: LogicalRelation => true
      // v2 file relations (when parquet runs through DSv2) — matched by
      // name so the guard needs no hard dependency on the v2 internals
      case r => r.getClass.getSimpleName == "DataSourceV2Relation"
    }
  }

  /** Sum of parquet footer record counts, sampled and read in parallel
    * (each open is an independent driver-side metadata fetch). */
  private def footerRowCount(df: DataFrame): Option[Long] = {
    val files = df.inputFiles.filter(_.endsWith(".parquet"))
    if (files.isEmpty) None
    else {
      val conf = df.sparkSession.sessionState.newHadoopConf()
      val sample = files.take(SampleFiles)
      val sampled = java.util.Arrays.stream(sample).parallel().mapToLong { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f), conf))
        try r.getRecordCount finally r.close()
      }.sum()
      Some(if (files.length <= SampleFiles) sampled
      else math.round(sampled.toDouble / sample.length * files.length))
    }
  }

  /** Row count without a Spark job when the plan allows it: parquet
    * footer sum for a bare file scan, a real count() for anything
    * filtered, joined, generated or in-memory. */
  def estimate(df: DataFrame): Long =
    (if (isBareFileScan(df.queryExecution.analyzed)) footerRowCount(df) else None)
      .getOrElse(df.count())
}
