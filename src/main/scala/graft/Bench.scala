package graft
import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/parquet-footer caches so per-query numbers
    // measure the query, not first-use costs.
    SparkEntry.queries.get("q1_pricing_summary")
      .foreach(fn => fn(spark, sfDir).queryExecution.toRdd.count())
    // min over SPARK_GRAFT_BENCH_RUNS runs (default 3): this sandbox shares
    // CPUs, and one-shot timings have shown 2-4x contention inflation on
    // individual queries across rounds (r5: d_components 15.7 s single-run
    // vs 2.98 s min-of-3); the per-query min is a far better estimate of
    // the plan's cost than any single sample.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b limits the run for local perf
    // iteration (same contract as Verify's SPARK_GRAFT_ONLY; driver never
    // sets it, so the round bench always measures the full surface)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"SPARK_GRAFT_BENCH_ONLY names unknown queries: $unknown")
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      // toRdd.count() materializes every output row of the optimized plan —
      // .count() would let Catalyst prune unfiltered windows/sorts away.
      // Failures report as -1, never as a plausible-looking time.
      val times = (1 to runs).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).queryExecution.toRdd.count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            None
        }
      }
      // ANY failed run reports -1 — a flaky query must never surface as a
      // plausible-looking min time
      // Settle the JVM between queries (outside the timed region): drop
      // cached plans and nudge the context cleaner so released
      // localCheckpoint/broadcast blocks from this query don't inflate
      // the NEXT query's GC time — r7 showed untouched queries swinging
      // +40-90% purely from accumulated suite-level heap pressure.
      // SPARK_GRAFT_BENCH_SETTLE=0 disables for A/B runs.
      if (sys.env.getOrElse("SPARK_GRAFT_BENCH_SETTLE", "1") != "0") {
        spark.catalog.clearCache()
        System.gc()
      }
      name -> (if (times.size < runs) -1.0 else times.min)
    }
    // Locale.ROOT: a comma-decimal default locale would format "0,123"
    // and corrupt the JSON
    def f(v: Double): String =
      if (v < 0) "-1" else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // BOTH output lines report the full-surface total (the compact line
    // only trims the per-query map) — computed once here so a helper
    // parameter can't silently shadow it
    val fullTotal = results.map(_._2).filter(_ >= 0).sum
    def jsonLine(rs: Seq[(String, Double)], extra: String): String = {
      val qs = rs.map { case (k, v) => s"\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${f(fullTotal)},"unit":"sec","queries":$qs$extra,"sf":"$sfDir"}"""
    }
    // Full per-query map → the canonical FILE. The printed line keeps only
    // the 40 most expensive queries and folds the rest into one "other"
    // bucket: with 119 queries the full map is ~2.6 KB and the driver's
    // bounded TAIL capture cut its head (BENCH_r03/r04/r05 parsed:null);
    // the compact line stays well under 1.5 KB at any future surface size.
    val fullLine = jsonLine(results, "")
    val (top, rest) = results.sortBy { case (_, v) => -v }.splitAt(40)
    val failed = rest.count(_._2 < 0)
    val compactLine =
      if (rest.isEmpty) fullLine
      else jsonLine(top.sortBy(_._1),
        s""","other":${f(rest.map(_._2).filter(_ >= 0).sum)},"other_n":${rest.size},"other_failed":$failed""")
    // a filtered run must never clobber the canonical full-surface file
    val defaultOut = if (only.isDefined) "/tmp/BENCH_FILTERED.json" else "BENCH_LOCAL.json"
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut)
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (fullLine + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] write $out failed: ${e.getMessage}") }
    // stop() BEFORE printing: the JSON stays the final stdout line, so a
    // tail capture keeps it intact; the file above is the canonical copy.
    spark.stop()
    println(compactLine)
    System.err.println(compactLine)
  }
}
