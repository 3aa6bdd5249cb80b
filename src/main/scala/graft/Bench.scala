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
    // BOTH printed lines report the FRESH full-surface total (the compact
    // line only trims the per-query map); the canonical FILE may carry the
    // min-merged total instead — each jsonLine names its total explicitly
    // so the two can't shadow each other
    val fullTotal = results.map(_._2).filter(_ >= 0).sum
    def jsonLine(total: Double, rs: Seq[(String, Double)], extra: String): String = {
      val qs = rs.map { case (k, v) => s"\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs$extra,"sf":"$sfDir"}"""
    }
    // MIN-MERGE the canonical file against the last committed ledger
    // (SURVEY §6 protocol, made structural after r12+r13 both closed with
    // a poisoned working tree): any full-surface run — the driver's
    // one-shot included — writes min(fresh, HEAD) per gate, so a
    // contention-inflated sample can never overwrite the quiet record on
    // disk. The PRINTED line stays the fresh one-shot (the driver's
    // BENCH_r{N} contract is an honest single sample). Fresh values win
    // when: the gate is new, the fresh run FAILED (-1 must surface), or
    // the gate is named in SPARK_GRAFT_BENCH_FRESH (set after a plan
    // change so a stale minimum of the OLD plan can't mask a regression —
    // the r12 stale-minima loophole). SPARK_GRAFT_BENCH_MINMERGE=0
    // disables for A/B runs.
    def minMerge(fresh: Seq[(String, Double)]): Seq[(String, Double)] = {
      if (sys.env.getOrElse("SPARK_GRAFT_BENCH_MINMERGE", "1") == "0") return fresh
      val forced = sys.env.getOrElse("SPARK_GRAFT_BENCH_FRESH", "")
        .split(",").map(_.trim).filter(_.nonEmpty).toSet
      val committed: Map[String, Double] =
        try {
          val txt = scala.sys.process.Process(
            Seq("git", "show", "HEAD:BENCH_LOCAL.json")).!!
          val jv = org.json4s.jackson.JsonMethods.parse(txt)
          (jv \ "queries") match {
            case org.json4s.JObject(fields) => fields.collect {
              case (k, org.json4s.JDouble(v)) => k -> v
              case (k, org.json4s.JInt(v)) => k -> v.toDouble
            }.toMap
            case _ => Map.empty[String, Double]
          }
        } catch { case e: Throwable =>
          System.err.println(s"[bench] min-merge skipped (no committed ledger): ${e.getMessage}")
          Map.empty[String, Double]
        }
      fresh.map { case (k, v) =>
        committed.get(k) match {
          case Some(old) if old > 0 && v > 0 && !forced(k) => k -> math.min(v, old)
          case _ => k -> v
        }
      }
    }
    // Full per-query map → the canonical FILE. The printed line keeps only
    // the 40 most expensive queries and folds the rest into one "other"
    // bucket: with 119 queries the full map is ~2.6 KB and the driver's
    // bounded TAIL capture cut its head (BENCH_r03/r04/r05 parsed:null);
    // the compact line stays well under 1.5 KB at any future surface size.
    val (top, rest) = results.sortBy { case (_, v) => -v }.splitAt(40)
    val failed = rest.count(_._2 < 0)
    val compactLine =
      if (rest.isEmpty) jsonLine(fullTotal, results, "")
      else jsonLine(fullTotal, top.sortBy(_._1),
        s""","other":${f(rest.map(_._2).filter(_ >= 0).sum)},"other_n":${rest.size},"other_failed":$failed""")
    // a filtered run must never clobber the canonical full-surface file
    val defaultOut = if (only.isDefined) "/tmp/BENCH_FILTERED.json" else "BENCH_LOCAL.json"
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut)
    // min-merge applies ONLY to the canonical ledger itself: a filtered
    // run writes elsewhere, and an explicit BENCH_OUT capture (the
    // driver's BENCH_r{N}, an A/B dump) must stay the fresh one-shot
    val merged = if (out == "BENCH_LOCAL.json") minMerge(results) else results
    val fileLine = jsonLine(merged.map(_._2).filter(_ >= 0).sum, merged, "")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (fileLine + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] write $out failed: ${e.getMessage}") }
    // stop() BEFORE printing: the JSON stays the final stdout line, so a
    // tail capture keeps it intact; the file above is the canonical copy.
    spark.stop()
    println(compactLine)
    System.err.println(compactLine)
  }
}
