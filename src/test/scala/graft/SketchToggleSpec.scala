package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sketch-percentile 100 TB toggle (q_rfm, t_curriculum): with
  * `approx = true` the exact percentile aggregation — a full sort
  * concentrated in one aggregate at scale — swaps for the
  * percentile_approx GK sketch (mergeable, one ordinary aggregation).
  * These specs bound what the swap may change: the scored assignments
  * (quintiles / quartile buckets) must agree with exact on ≥ 99 % of
  * rows at sf0.1 — a sketch threshold can only move rows sitting within
  * its rank error of a boundary. */
class SketchToggleSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val sf = "/root/testdata/sf0.1"

  test("q_rfm approx=true: quintile assignments match exact on >= 99% of customers at sf0.1") {
    val exact = graft.queries.Relational4.qRfm(spark, sf, approx = false)
      .select(col("o_custkey"), col("r_score"), col("f_score"), col("m_score"))
    val approx = graft.queries.Relational4.qRfm(spark, sf, approx = true)
      .select(col("o_custkey"), col("r_score").as("ra"), col("f_score").as("fa"),
        col("m_score").as("ma"))
    val j = exact.join(approx, "o_custkey").cache()
    try {
      val n = j.count()
      assert(n > 0)
      val agree = j.filter(col("r_score") === col("ra") &&
        col("f_score") === col("fa") && col("m_score") === col("ma")).count()
      assert(agree.toDouble / n >= 0.99,
        s"sketch quintiles agree on $agree/$n customers — below the 99% contract")
    } finally j.unpersist()
  }

  test("t_curriculum approx=true: quartile buckets match exact on >= 99% of documents at sf0.1") {
    val exact = graft.queries.Text.tCurriculum(spark, sf, approx = false)
      .select(col("doc_id"), col("bucket"))
    val approx = graft.queries.Text.tCurriculum(spark, sf, approx = true)
      .select(col("doc_id"), col("bucket").as("ba"))
    val j = exact.join(approx, "doc_id").cache()
    try {
      val n = j.count()
      assert(n > 0)
      val agree = j.filter(col("bucket") === col("ba")).count()
      assert(agree.toDouble / n >= 0.99,
        s"sketch quartiles agree on $agree/$n documents — below the 99% contract")
    } finally j.unpersist()
  }

  test("q_histogram_eqd approx=true: bucket masses agree with exact within 1% at sf0.1") {
    // bucket identity is positional (1..8), so compare per-bucket row
    // counts: a sketch boundary can only move rows within its rank error
    // of the cut, bounding each bucket's mass shift to ~1e-4 of the corpus
    val exact = graft.queries.Relational6.qHistogramEqd(spark, sf, approx = false)
      .select(col("bucket"), col("n"))
    val approx = graft.queries.Relational6.qHistogramEqd(spark, sf, approx = true)
      .select(col("bucket"), col("n").as("na"))
    val rows = exact.join(approx, "bucket").collect()
    assert(rows.length == 8, s"both paths must produce all 8 buckets, got ${rows.length}")
    val total = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      val drift = math.abs(r.getLong(1) - r.getLong(2)).toDouble / total
      assert(drift <= 0.01,
        s"bucket ${r.get(0)}: exact=${r.getLong(1)} approx=${r.getLong(2)} — mass drift $drift > 1%")
    }
    val approxPlan = graft.queries.Relational6.qHistogramEqd(spark, sf, approx = true)
      .queryExecution.optimizedPlan.toString
    assert(approxPlan.contains("percentile_approx"),
      s"approx path must use the sketch aggregate:\n${approxPlan.take(1500)}")
  }

  test("e_mad_outliers approx=true: flagged row sets agree with exact on >= 99% at sf0.1") {
    // the flag rule |x−med|/(1.4826·MAD) > 3 compares against sketch
    // medians under approx — only rows within the sketch's rank error of
    // the decision boundary may flip; the planted ×10 outliers sit at
    // score ~12 and must flag under BOTH paths
    def keys(approx: Boolean) = graft.queries.Etl2.eMadOutliers(spark, sf, approx)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"))
    val e = keys(approx = false).cache(); val a = keys(approx = true).cache()
    try {
      val ne = e.count(); val na = a.count()
      assert(ne > 0, "exact path flagged nothing — the planted outliers are gone")
      // multiset compare (exceptAll): the synthetic lineitem carries a few
      // duplicate (orderkey, linenumber) keys, so set-intersect undercounts
      val diff = e.exceptAll(a).count() + a.exceptAll(e).count()
      val union = math.max(ne, na) + diff / 2
      assert(1.0 - diff.toDouble / union >= 0.99,
        s"exact/approx flag multisets differ on $diff of ~$union rows — below the 99% contract")
    } finally { e.unpersist(); a.unpersist() }
  }

  test("e_mad_outliers approx path swaps both percentile passes for the sketch") {
    val exactPlan = graft.queries.Etl2.eMadOutliers(spark, sf, approx = false)
      .queryExecution.optimizedPlan.toString
    val approxPlan = graft.queries.Etl2.eMadOutliers(spark, sf, approx = true)
      .queryExecution.optimizedPlan.toString
    assert(exactPlan.contains("percentile") && !exactPlan.contains("percentile_approx"))
    assert(approxPlan.contains("percentile_approx"),
      s"approx path must use the sketch aggregate:\n${approxPlan.take(1500)}")
  }

  test("approx path replaces the exact Percentile aggregate with ApproximatePercentile in the plan") {
    val exactPlan = graft.queries.Text.tCurriculum(spark, sf, approx = false)
      .queryExecution.optimizedPlan.toString
    val approxPlan = graft.queries.Text.tCurriculum(spark, sf, approx = true)
      .queryExecution.optimizedPlan.toString
    assert(exactPlan.contains("percentile") && !exactPlan.contains("percentile_approx"),
      "exact path must use the exact percentile aggregate")
    assert(approxPlan.contains("percentile_approx"),
      s"approx path must use the sketch aggregate:\n${approxPlan.take(1500)}")
  }

  test("percentile_approx split-dependence: measured REAL, and the bounds-only gate contract holds under every split") {
    // SURVEY §6 caveat, now TESTED instead of observed: percentile_approx's
    // QuantileSummaries compression IS split-dependent — running this with
    // a byte-equality assertion showed the continuous column's p90 drift
    // across partition counts at sf0.1 (94527.87 / 94524.73 / …, all
    // within the accuracy-10000 window). That is exactly why
    // q_approx_quantiles NEVER hashes sketch values: its output is exact
    // percentiles plus IN-WINDOW booleans. This spec pins the contract
    // that makes the gate split-safe: across 5 partitionings and a
    // resorted layout, every sketch value stays inside the gate's own
    // exact-percentile error window (so the hashed booleans are TRUE under
    // ANY split), even though the raw sketch bytes may differ.
    val li = graft.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
    // the gate's error windows, from the exact percentile pair (computed once)
    val windows = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, array(0.23, 0.27, 0.48, 0.52, 0.73, 0.77))").as("eq"),
        expr("percentile(l_extendedprice, array(0.88, 0.92))").as("ep"))
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[Double](1), r.getSeq[Double](2)))).toMap
    def check(df: org.apache.spark.sql.DataFrame, label: String): Unit =
      df.groupBy(col("l_returnflag"))
        .agg(expr("percentile_approx(l_quantity, array(0.25, 0.5, 0.75), 10000)").as("aq"),
          expr("percentile_approx(l_extendedprice, 0.9, 10000)").as("ap90"))
        .collect().foreach { r =>
          val (eq, ep) = windows(r.getString(0))
          val aq = r.getSeq[Double](1)
          assert(aq(0) >= eq(0) && aq(0) <= eq(1), s"$label q25 ${aq(0)} outside [${eq(0)},${eq(1)}]")
          assert(aq(1) >= eq(2) && aq(1) <= eq(3), s"$label q50 ${aq(1)} outside window")
          assert(aq(2) >= eq(4) && aq(2) <= eq(5), s"$label q75 ${aq(2)} outside window")
          assert(r.getDouble(2) >= ep(0) && r.getDouble(2) <= ep(1),
            s"$label p90 ${r.getDouble(2)} outside [${ep(0)},${ep(1)}]")
        }
    check(li.repartition(3), "p3")
    check(li.repartition(8), "p8")
    check(li.repartition(32), "p32")
    check(li.repartition(97), "p97")
    check(li.repartition(8, col("l_returnflag")), "keyed")
    check(li.orderBy(col("l_extendedprice")).repartition(8), "resorted")
  }
}
