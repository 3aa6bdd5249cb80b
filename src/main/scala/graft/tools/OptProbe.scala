package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 optimization scratch probe (dev-only, rewritten per
  * experiment). Current experiment: the dedup derived stages — d_curate /
  * d_semdedup run MANY small jobs (window collapse, LSH, Jaccard,
  * connected-components rounds, k-means iterations); a job-level listener
  * attributes the gates' wall time to driver-scheduled job count vs real
  * compute, guiding whether to cut rounds or per-round constants. */
object OptProbe {
  def time[T](name: String, n: Int = 3)(f: => T): T = {
    var best = Double.MaxValue; var r: T = null.asInstanceOf[T]
    for (_ <- 1 to n) {
      val t0 = System.nanoTime(); r = f
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    println(f"$best%8.3f  $name"); r
  }

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
    def run(df: DataFrame): Long = df.queryExecution.toRdd.count()

    // job-level listener: (start, end, site) per job id
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
        jobs.put(j.jobId, (j.time, 0L, site))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.computeIfPresent(j.jobId, (_, v) => (v._1, j.time, v._3))
    })
    def jobReport(label: String)(f: => Unit): Unit = {
      jobs.clear()
      val t0 = System.nanoTime(); f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val spans = jobs.asScala.toSeq.sortBy(_._1).map { case (id, (s, e, n)) => (id, s, e, n) }
      val busy = spans.map { case (_, s, e, _) => math.max(0L, e - s) }.sum / 1e3
      println(f"$wall%8.3f  $label: ${spans.size} jobs, sum(job spans)=$busy%.3f s")
      for ((id, s, e, n) <- spans)
        println(f"    job $id%3d ${(e - s) / 1e3}%7.3f s  ${n.take(90)}")
    }

    // warm + profile the remaining top untouched gates
    for (g <- Seq("q_rev_rec", "io_vacuum", "q_gapfill", "t_decontam_ngram",
        "q_theil_sen", "s_mmr", "t_classify")) {
      time(s"$g warm", 1)(run(graft.SparkEntry.queries(g)(spark, dir)))
      jobReport(g)(run(graft.SparkEntry.queries(g)(spark, dir)))
    }

    // warm the shared stage + JVM
    time("d_curate warm (stage build + first run)", 1)(
      run(graft.SparkEntry.queries("d_curate")(spark, dir)))
    jobReport("d_curate (warm stage)")(run(graft.SparkEntry.queries("d_curate")(spark, dir)))
    time("d_semdedup warm", 1)(run(graft.SparkEntry.queries("d_semdedup")(spark, dir)))
    jobReport("d_semdedup (warm)")(run(graft.SparkEntry.queries("d_semdedup")(spark, dir)))
    jobReport("d_editdist")(run(graft.SparkEntry.queries("d_editdist")(spark, dir)))

    // d_editdist sub-stage decomposition
    val heads = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), substring(col("text"), 1, 24).as("head"))
      .withColumn("blk", substring(col("head"), 1, 4))
    time("editdist: heads scan only")(run(heads))
    val blocks = heads.groupBy(col("blk"))
      .agg(array_sort(collect_list(struct(col("doc_id"), col("head")))).as("ds"))
    time("editdist: scan + collect_list blocks")(run(blocks))
    val pairsExpanded = blocks
      .select(explode(expr(
        "flatten(transform(ds, (x, i) -> transform(slice(ds, i + 2, size(ds) - i - 1), " +
          "y -> struct(x.doc_id AS a_id, x.head AS ha, y.doc_id AS b_id, y.head AS hb))))"))
        .as("e"))
    time("editdist: + pair expansion")(run(pairsExpanded))
    time("editdist: + length guard + levenshtein")(run(
      pairsExpanded
        .select(col("e.a_id").as("a_id"), col("e.ha").as("ha"),
          col("e.b_id").as("b_id"), col("e.hb").as("hb"))
        .filter(abs(length(col("ha")) - length(col("hb"))) <= 2)
        .withColumn("dist", levenshtein(col("ha"), col("hb"), 2))
        .filter(col("dist").between(0, 2))))
    println("pair count = " + pairsExpanded.count())
    spark.stop()
  }
}
