package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphIterate

/** The window-partitioning LINT (VERDICT r12 "Next round" #6): sweeps every
  * batch gate's physical plan and asserts no sort-window can become a
  * single-reducer corpus sort at 100×.
  *
  * The class this guards against is the one real scale-killer shape found
  * across twelve rounds: `PARTITION BY group ORDER BY value` where `group`
  * has bounded cardinality (event_type, nation, day...) and `value` ranges
  * over an unbounded fact — each group's whole value set then sorts through
  * ONE reducer task. The r12 fix (operators/BandedRank) splits such windows
  * by a broadcast value band; this lint makes the class unable to land
  * silently again.
  *
  * Every WindowExec in every gate plan must satisfy ONE of:
  *   1. KEYED    — its partition spec references a column whose cardinality
  *                 grows with the corpus (custkey, doc_id, ...): the window
  *                 fans out with the data.
  *   2. BANDED   — its partition spec includes a band/bucket/salt component:
  *                 the BandedRank pattern, where the band count is the
  *                 explicit scale knob.
  *   3. RANKLIMIT — a WindowGroupLimitExec sits below it: Spark's rank-limit
  *                 pushdown already pruned each partition to ≤k rows before
  *                 the final window (the top-k-per-group shape).
  *   4. ALLOWLISTED — the gate appears in `boundedFrames` with a reason:
  *                 the window's CHILD is a provably bounded frame (a
  *                 post-aggregation on calendar / band / enum keys whose row
  *                 count does not grow with the corpus), so a flat window
  *                 over it is fine at any scale.
  *
  * Checkpoint transparency: `localCheckpoint` cuts logical lineage, which
  * would hide any window inside a checkpointed subframe from this sweep —
  * so the sweep runs with `-Dgraft.lint.noCheckpoint=true`, which turns the
  * query surface's Ckpt helpers into identity and keeps the FULL plan
  * visible. The remaining scoped boundary: operator-INTERNAL checkpoints
  * (GraphIterate loop rounds, StageCache persisted stages, IvfIndex
  * builds) stay opaque by design — iterative lineage must truncate — and
  * those operators carry their own plan/shape specs.
  *
  * Streaming gates (st_*) are out of scope: their windows are
  * watermark-bounded state, not sort windows, and their builders execute
  * streams at construction time.
  *
  * EXECUTION MODEL: the sweep mutates global JVM state — the
  * `graft.lint.noCheckpoint` system property and two StageCache.release
  * calls on the shared session — which is correct only while suites run
  * strictly SEQUENTIALLY (the build's setting: sbt forks one test JVM and
  * runs suites serially in it; `Test / testForkedParallel := false` is
  * pinned in build.sbt). A suite running concurrently with this one could
  * read an un-checkpointed stage or build a gate under the bypass.
  */
class WindowLintSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  /** Partition-key name fragments whose cardinality grows with the corpus. */
  private val UnboundedKeys = Seq(
    "custkey", "orderkey", "suppkey", "partkey", "doc_id", "docid", "user_id",
    "userid", "session", "url", "host", "term", "token", "sid", "entity",
    "chunk", "span", "pair", "path", "blob", "query_id", "qid")

  /** Measure columns are corpus-cardinality too (a window partitioned by
    * (group, value) shards on the value's full support) — matched ANCHORED
    * ("value" exactly, or the x_val/y_val suffix), never as a bare "val"
    * fragment: bounded names like valid_to / interval must not pass. */
  private def isValueLike(n: String): Boolean = n == "value" || n.endsWith("_val")

  /** The scalable-knob pattern: banded / bucketed / salted partitions.
    * "bk" is the repo-wide LSH band-bucket key (dedup/MinHashLsh), matched
    * as a whole name. */
  private val KnobKeys = Seq("band", "bucket", "salt", "shard")
  private val KnobExact = Set("bk")

  /** Exact-name corpus-cardinality keys too short for fragment matching:
    * "v" is the GraphIterate vertex id (a contains-match on "v" would
    * bless "value"-partitioned windows). */
  private val UnboundedExact = Set("v")

  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => unwrap(a.inputPlan)
    case x => x
  }

  private def allWindows(p: SparkPlan): Seq[WindowExec] = unwrap(p) match {
    case w: WindowExec => w +: w.children.flatMap(allWindows)
    case other => other.children.flatMap(allWindows)
  }

  private def hasKBound(p: SparkPlan): Boolean = unwrap(p) match {
    case _: WindowGroupLimitExec => true
    case _: graft.plans.TopKPerKeyExec => true
    // a global limit below the window bounds its whole input (the
    // orderBy().limit(k) → rank-over-k-rows reporting shape)
    case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
    case _: org.apache.spark.sql.execution.GlobalLimitExec => true
    case _: org.apache.spark.sql.execution.CollectLimitExec => true
    case other if other.children.isEmpty => false
    // multi-child nodes (joins, unions) are k-bounded only when EVERY
    // input is — a limit on one join side must not bless a window over
    // the still-fact-sized joined frame
    case other => other.children.forall(hasKBound)
  }

  private def attrNames(es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Seq[String] =
    es.flatMap(_.collect { case a: AttributeReference => a.name.toLowerCase })

  /** Classifies every window in the frame's physical plan; returns the
    * partition-name lists of the windows NOT self-evidently scalable
    * (classes 1-3) — the caller decides allowlisting.
    *
    * A band/bucket column in the ORDER spec also passes as BANDED: that is
    * the cross-band-offset window of BandedRank — it runs over the
    * ≤|groups|·bands band-count frame, bounded by construction. */
  private[graft] def flaggedWindows(df: DataFrame): Seq[Seq[String]] =
    allWindows(df.queryExecution.executedPlan).flatMap { w =>
      val names = attrNames(w.partitionSpec)
      val ordNames = attrNames(w.orderSpec.map(_.child))
      val keyed = names.exists(n => UnboundedKeys.exists(n.contains) ||
        UnboundedExact.contains(n) || isValueLike(n))
      val banded = (names ++ ordNames).exists(n =>
        KnobKeys.exists(n.contains) || KnobExact.contains(n))
      val kBound = hasKBound(w.child)
      if (keyed || banded || kBound) None else Some(names)
    }

  /** Gates whose flagged windows ride provably bounded child frames — each
    * entry pins the EXACT expected flagged signature (sorted partition-name
    * lists) plus the reason the frame is bounded. Pinning the signature
    * means a new un-banded window added to an allowlisted gate still fails
    * the sweep (the allowlist cannot mask a regression), and an entry whose
    * gate no longer flags anything is stale and fails too. */
  private val boundedFrames: Map[String, (Seq[String], String)] = Map(
    "e_analysis_version" -> (Seq("(sg_brand)"),
      "version chain rides the ≤|brands|×|years| analysis frame"),
    "q_apportion" -> (Seq("GLOBAL"),
      "remainder ranking over the ≤|nations| quota frame"),
    "q_backlog" -> (Seq("GLOBAL"),
      "running order/ship sums on the bounded calendar day frame"),
    "q_bh_fdr" -> (Seq("GLOBAL", "GLOBAL"),
      "BH step-up rank over the ≤|types| p-value frame (planned twice: the i_max scan and the output both consume it)"),
    "q_bollinger" -> (Seq("GLOBAL", "GLOBAL"),
      "rolling mean/stddev over the bounded day frame"),
    "q_boot_ci" -> (Seq("(event_type)"),
      "replicate rank over the ≤|types|×59 replicate-mean frame (R = BootR, fixed)"),
    "q_changepoint" -> (Seq("GLOBAL", "GLOBAL"),
      "prefix sums + totals over the bounded day frame"),
    "q_cusum" -> (Seq("GLOBAL", "GLOBAL"),
      "cumulative deviation over the bounded day frame"),
    "q_drawdown" -> (Seq("GLOBAL"),
      "running max over the bounded day frame"),
    "q_ewma" -> (Seq("(o_orderpriority)"),
      "8-tap lag chain over the |priorities|×|months| monthly frame"),
    "q_growth_acct" -> (Seq("GLOBAL"),
      "day-over-day lag on the ≤|days| daily rollup"),
    "q_lift_gains" -> (Seq("(grp)"),
      "cumulative gains over the ≤|priorities|×10 decile frame"),
    "q_ltv" -> (Seq("(cohort_week)"),
      "cumulative revenue over the |cohorts|×|weeks| cohort frame"),
    "q_mom_yoy" -> (Seq("GLOBAL"),
      "lag windows on the ≤|months| monthly frame"),
    "q_movers" -> (Seq("(priority)"),
      "MoM lag on the |priorities|×|months| monthly frame"),
    "q_runs_test" -> (Seq("GLOBAL"),
      "sign-run scan over the bounded day frame"),
    "q_seasonal" -> (Seq("(event_type)"),
      "lag(24) on the zero-filled |types|×|hours| calendar spine"),
    "s_probe_cost" -> (Seq("(q_id)"),
      "per-query centroid ranking: C≈√N rows per partition (the IVF probe-list frame)"),
    "s_recall_curve" -> (Seq("(q_id)"),
      "per-query centroid ranking: C≈√N rows per partition (the IVF probe-list frame)"),
    "q_theil_sen" -> (Seq("GLOBAL"),
      "in-band key frame of the histogram selection — n_pairs/8192 rows expected, B is the knob"),
    "q_trailing7" -> (Seq("GLOBAL"),
      "7-row rolling frame on the bounded day frame"),
    "q_wape" -> (Seq("(event_type)"),
      "lag(24) on the zero-filled |types|×|hours| calendar spine"))

  private def sig(ws: Seq[Seq[String]]): Seq[String] =
    ws.map(n => if (n.isEmpty) "GLOBAL" else n.mkString("(", ",", ")")).sorted

  private def cartesians(p: SparkPlan): Int = unwrap(p) match {
    case _: org.apache.spark.sql.execution.joins.CartesianProductExec => 1
    case other => other.children.map(cartesians).sum
  }

  test("every batch gate's sort-windows are keyed, banded, rank-limited, or allowlisted-bounded; no gate plans a CartesianProduct") {
    val gates = SparkEntry.queries.keys.toSeq.sorted.filterNot(_.startsWith("st_"))
    val flagged = scala.collection.mutable.LinkedHashMap[String, Seq[String]]()
    val carts = scala.collection.mutable.LinkedHashMap[String, Int]()
    System.setProperty("graft.lint.noCheckpoint", "true")
    // StageCache would defeat the bypass order-dependently: stages cached
    // by earlier suites were built WITH checkpoints (lineage truncated at a
    // LogicalRDD), so the sweep must drop them and rebuild under the
    // bypass; dropping again afterwards keeps later suites from reading
    // the sweep's un-checkpointed frames
    StageCache.release(spark)
    try gates.foreach { g =>
      val df = SparkEntry.queries(g)(spark, dir)
      val f = flaggedWindows(df)
      if (f.nonEmpty) flagged(g) = sig(f)
      // same sweep, second global guard: a non-broadcast CartesianProduct
      // is corpus² work at any scale (the calendar pair joins are
      // BroadcastNestedLoopJoin — a bounded side broadcast — never this)
      val nc = cartesians(df.queryExecution.executedPlan)
      if (nc > 0) carts(g) = nc
    } finally {
      System.clearProperty("graft.lint.noCheckpoint")
      StageCache.release(spark)
    }
    val report = flagged.map { case (g, ws) => s"$g: ${ws.mkString(" ")}" }.mkString("\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "windowlint.txt"),
      report.getBytes)
    val violations = flagged.filter { case (g, ws) =>
      !boundedFrames.get(g).exists(_._1.sorted == ws)
    }
    assert(violations.isEmpty,
      "windows that would single-reduce at 100x (band them, or allowlist " +
        s"with the exact signature and the bound):\n$report\nviolations: ${violations.keys.toSeq.sorted}")
    val stale = boundedFrames.keySet -- flagged.keySet
    assert(stale.isEmpty, s"stale allowlist entries (no flagged window anymore): $stale")
    assert(carts.isEmpty, s"CartesianProductExec in gate plans: $carts")
  }

  test("control: a debanded q_mann_whitney (flat rank over event_type) is flagged") {
    val ev = Tables.events(spark, dir).filter(col("value").isNotNull)
    val flat = ev.withColumn("r",
      rank().over(Window.partitionBy(col("event_type")).orderBy(col("value"))))
      .groupBy(col("event_type")).agg(sum(col("r")).as("rsum"))
    val f = flaggedWindows(flat)
    assert(f.nonEmpty, "the lint must flag a flat rank window over a bounded group key")
    assert(f.exists(_.exists(_.contains("event_type"))), f.toString)
  }

  // ------------------------------------------------------ operator rounds
  // Operator-INTERNAL iterative plans checkpoint per round, which truncates
  // lineage and hides every round from the gate-level sweep above — the
  // lint's one declared blind spot (r13 VERDICT #6). The operators now
  // expose their round builders private[graft], so ONE representative
  // round of each loop is swept here with the same classifier.

  /** Fact-derived co-purchase edges, the q_label_prop/q_kcore shape minus
    * the gate's checkpoint (the round plan must stay fully visible). */
  private def factEdges: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
    val und = li.select(col("ok"), col("p").as("a"))
      .join(li.select(col("ok"), col("p").as("b")), "ok")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    val bi = und.select(col("a").as("v"), col("b").as("nbr"))
      .unionByName(und.select(col("b").as("v"), col("a").as("nbr")))
    (und, bi)
  }

  test("operator rounds: one unrolled GraphIterate round per loop (bfs, kcore, labelProp) is keyed-scalable and cartesian-free") {
    val (und, bi) = factEdges
    val seed = bi.select(col("v"), lit(0L).as("dist")).orderBy(col("v")).limit(1)
    val rounds = Seq(
      "bfsRound" -> GraphIterate.bfsRound(bi, seed),
      "kcoreRound" -> GraphIterate.kcoreRound(und, 2),
      "labelPropRound" -> GraphIterate.labelPropRound(
        bi, GraphIterate.labelPropSeed(bi)))
    rounds.foreach { case (name, df) =>
      val f = flaggedWindows(df)
      assert(f.isEmpty, s"$name plans a window that single-reduces at 100x: ${sig(f)}")
      val nc = cartesians(df.queryExecution.executedPlan)
      assert(nc == 0, s"$name plans $nc CartesianProductExec")
    }
  }

  test("operator rounds: the IvfIndex build assignment plan (Knn.assignBuckets) is window-free and cartesian-free") {
    // the exact plan IvfIndex.build/append write through: corpus ×
    // broadcast(centroids) must stay a BroadcastNestedLoopJoin feeding an
    // aggregation-based argmax — NO per-centroid sort window, NO
    // CartesianProduct (corpus² at any scale)
    val emb = Tables.embeddings(spark, dir)
    val centroids = emb.orderBy(col("vec_id")).limit(4)
      .select(col("vec_id").as("c_id"),
        col("embedding").cast("array<double>").as("c_vec"))
    val assigned = graft.similarity.Knn.assignBuckets(
      spark, emb, centroids, "vec_id", "embedding")
    val f = flaggedWindows(assigned)
    assert(f.isEmpty, s"assignBuckets plans a flat window: ${sig(f)}")
    assert(cartesians(assigned.queryExecution.executedPlan) == 0,
      "assignBuckets must broadcast the centroid side, never CartesianProduct")
  }

  test("control: a label-keyed labelProp round (bounded partition key) is flagged") {
    // de-keying the round's ranking from the vertex id to the label —
    // after a few rounds labels collapse to few communities, so this
    // window funnels each community's whole vertex set through one
    // reducer. A running-sum frame, not rank()+filter(rn=1): the latter
    // is legitimately rescued by Spark's WindowGroupLimit pushdown
    // (map-side per-partition pruning), which the gate-sweep classifies
    // RANKLIMIT — the control must pin the UNRESCUED shape.
    val (_, bi) = factEdges
    val labels = GraphIterate.labelPropSeed(bi)
    val counted = bi
      .join(labels.select(col("v").as("nbr"), col("label")), "nbr")
      .groupBy(col("v"), col("label")).agg(count(lit(1)).as("n"))
    val bad = counted.withColumn("cum", sum(col("n")).over(
        Window.partitionBy(col("label")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val f = flaggedWindows(bad)
    assert(f.nonEmpty, "the lint must flag a label-partitioned running window")
    assert(f.exists(_.contains("label")), f.toString)
  }

  test("control: a per-centroid rank assignment (window over c_id) is flagged") {
    // the naive bucket assignment: rank the corpus within each centroid
    // partition — C≈√N partitions each sorting N/C corpus rows through one
    // reducer; the aggregation-based argmax exists precisely to avoid this
    val emb = Tables.embeddings(spark, dir)
    val centroids = emb.orderBy(col("vec_id")).limit(4)
      .select(col("vec_id").as("c_id"),
        col("embedding").cast("array<double>").as("c_vec"))
    val bad = emb.select(col("vec_id").as("n_id"),
        col("embedding").cast("array<double>").as("n_vec"))
      .crossJoin(broadcast(centroids))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("c_id")).orderBy(col("n_id"))))
    val f = flaggedWindows(bad)
    assert(f.nonEmpty, "the lint must flag a per-centroid corpus rank window")
    assert(f.exists(_.contains("c_id")), f.toString)
  }

  test("control: a limit on ONE join side does not bless a window over the fact-sized join") {
    // the joined frame is still fact-sized — only the dim side is limited;
    // hasKBound must demand every input of a multi-child node be bounded
    val ev = Tables.events(spark, dir).filter(col("value").isNotNull)
      .select(col("event_type"), col("value"))
    val dim = ev.select(col("event_type")).distinct()
      .orderBy(col("event_type")).limit(2)
    val joined = ev.join(dim, "event_type")
    val flat = joined.withColumn("r",
      rank().over(Window.partitionBy(col("event_type")).orderBy(col("value"))))
      .groupBy(col("event_type")).agg(sum(col("r")).as("rsum"))
    val f = flaggedWindows(flat)
    assert(f.nonEmpty,
      "a join-side limit must not classify the fact-sized window as rank-limited")
  }
}
