package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

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
      val keyed = names.exists(n => UnboundedKeys.exists(n.contains) || isValueLike(n))
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
    "q_bollinger" -> (Seq("GLOBAL", "GLOBAL"),
      "rolling mean/stddev over the bounded day frame"),
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
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/windowlint.txt"),
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
