package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: print each named gate's scan lines (ReadSchema +
  * PushedFilters) from the formatted plan — the quick audit that a new
  * query's scans prune columns and push predicates before PlanSpec pins
  * land. Usage:
  *   sbt "runMain graft.tools.PlanPeek q_a q_b ..."   (default: all) */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) {
      val f = try graft.SparkEntry.queries(q)(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      catch { case e: Throwable => s"PLAN FAILED: ${e.getMessage}" }
      println(s"=== $q")
      f.linesIterator
        .filter(l => l.contains("ReadSchema") || l.contains("PushedFilters") || l.startsWith("PLAN FAILED"))
        .foreach(l => println("  " + l.trim.take(200)))
    }
    spark.stop()
  }
}
