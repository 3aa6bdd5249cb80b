package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: dump each named gate's FULL `explain("formatted")` to
  * `<outDir>/<gate>_<suffix>.txt` — the before/after plan evidence the
  * optimization rounds commit under plans/r<N>/. Usage:
  *   SPARK_GRAFT_PLAN_OUT=plans/r15 SPARK_GRAFT_PLAN_SUFFIX=before \
  *     sbt "runMain graft.tools.PlanDump q_a q_b ..."
  * Defaults: out=plans/tmp, suffix=before, sf dir=/root/testdata/sf0.1,
  * cpus/shuffle partitions=32 (the bench's local shape, so the dumped plan
  * is the one the bench actually runs). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_PLAN_OUT", "plans/tmp")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) {
      val txt = try graft.SparkEntry.queries(q)(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      catch { case e: Throwable => s"PLAN FAILED: ${e.getMessage}" }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$out/${q}_$suffix.txt"), txt.getBytes("UTF-8"))
      println(s"[plandump] $q -> $out/${q}_$suffix.txt (${txt.count(_ == '\n')} lines)")
    }
    spark.stop()
  }
}
