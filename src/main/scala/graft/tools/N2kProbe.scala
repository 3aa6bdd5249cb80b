package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.N2kBinding
import graft.operators.UpsertMerge

/** Phase timing of the e_store_n2k gate (the round-9 VERDICT asked for a
  * measured decomposition of its 5.8 s: Derby vs driver scheduling vs
  * shuffle — note the gate path importPairSummary touches NO database;
  * Derby appears only in the storeAll spec flow).
  *
  * Run: sbt "runMain graft.tools.N2kProbe" (sf0.1 default). */
object N2kProbe {
  import TimeProbe.time

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // same window bounds as queries.N2k (Lo1..Hi2 span, carved into two)
    val sp = time("span build+checkpoint (cold)") {
      val d = N2kBinding.window(spark, dir, "1996-01-01", "1999-01-01", keepDate = true)
        .localCheckpoint(false)
      d.queryExecution.toRdd.count(); d
    }
    val w1 = sp.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz")).drop("o_orderdate")
    val w2 = sp.filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp_ntz")).drop("o_orderdate")

    // per-table serial chains (extract+merge+merge, no summary/observe):
    // the pure compute cost of each table without pool overlap
    var serialSum = 0.0
    for (t <- N2kBinding.Graph) {
      val t0 = System.nanoTime()
      val e1 = N2kBinding.extract(t, w1)
      val e2 = N2kBinding.extract(t, w2)
      val m1 =
        if (t.stamped) UpsertMerge.stampedMerge(N2kBinding.emptyState(t, w1), e1, t.keyCols, t.attrCols, lit(1L))
        else UpsertMerge.merge(N2kBinding.emptyState(t, w1), e1, t.keyCols, t.attrCols)
      val m2 =
        if (t.stamped) UpsertMerge.stampedMerge(m1.drop("action"), e2, t.keyCols, t.attrCols, lit(2L))
        else UpsertMerge.merge(m1.drop("action"), e2, t.keyCols, t.attrCols)
      m2.queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      serialSum += dt
      println(f"$dt%8.2f    chain ${t.name}")
    }
    println(f"$serialSum%8.2f  serial chain sum (no pool, no summary)")

    // the real fused path, warm span: chains (pooled) vs final sort
    val df = time("importPairSummary chains (pooled, warm span)") {
      N2kBinding.importPairSummary(w1, w2)
    }
    time("final repartition(1) sort")(df.queryExecution.toRdd.count())
    // repeat to see steady-state
    time("importPairSummary FULL (2nd)") {
      N2kBinding.importPairSummary(w1, w2).queryExecution.toRdd.count()
    }
    time("importPairSummary FULL (3rd)") {
      N2kBinding.importPairSummary(w1, w2).queryExecution.toRdd.count()
    }
    // A/B: the single-union-job variant (one action, no driver pool)
    for (i <- 1 to 3)
      time(s"importPairSummaryFused ($i)") {
        N2kBinding.importPairSummaryFused(w1, w2).queryExecution.toRdd.count()
      }
    spark.stop()
  }
}
