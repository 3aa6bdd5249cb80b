package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph analytics over relational data (SURVEY.md §2A) — the iterative
  * and join-explosive workloads that complete the engine's graph story
  * next to Components (connected components) and Hierarchy (pointer
  * doubling): PageRank by unrolled power iteration and triangle counting
  * by wedge join. Both DataFrame-only, both exactly oracled: rank
  * contributions aggregate through DECIMAL(38,15) (partition-order
  * invariant at rank magnitudes), the teleport/damping arithmetic is a
  * pinned literal chain, and triangle counting is all-integer. */
object GraphQ {

  private val Damping = "0.85"
  private val Teleport = "0.15"
  private val PrIters = 3

  /** Decimal-pinned sum for rank-magnitude doubles (xsum's DECIMAL(18,6)
    * would truncate 1e-5-scale ranks to noise; scale 15 stays inside a
    * double's shortest-roundtrip digits, where both engines' double →
    * decimal conversions provably agree — scale 18 reads digits past the
    * shortest representation and the conversion paths diverge by 1 ulp). */
  private def prSum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(38,15)")).cast("double")

  /** q_pagerank: 3 power iterations over the customer containment tree
    * (child → parent edges, keys < 7 are roots): rank' = 0.15/N + 0.85 ·
    * Σ_in rank/outdeg, dangling mass intentionally dropped (the simple
    * variant — semantics defined identically in the oracle). Each
    * iteration is one edge join + one dst-keyed decimal aggregation —
    * the canonical iterate-and-shuffle workload; rounds localCheckpoint
    * like every iterative operator here. */
  def qPagerank(s: SparkSession, dir: String): DataFrame = {
    val nodes = Tables.customer(s, dir).select(col("c_custkey").as("id"))
    val edges = nodes.filter(col("id") >= 7)
      .select(col("id").as("src"), expr("CAST(id div 7 AS BIGINT)").as("dst"))
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(false)
    val nTotal = nodes.agg(count(lit(1)).as("n"))
    var rank = nodes.crossJoin(broadcast(nTotal))
      .select(col("id"), (lit(1.0) / col("n").cast("double")).as("rank"))
      .localCheckpoint(false)
    for (_ <- 1 to PrIters) {
      val contrib = edges.join(rank, col("src") === col("id"))
        .join(outdeg, "src")
        .select(col("dst"), (col("rank") / col("outdeg").cast("double")).as("w"))
      val sums = contrib.groupBy(col("dst")).agg(prSum(col("w")).as("s"))
      rank = nodes.join(sums, col("id") === col("dst"), "left")
        .crossJoin(broadcast(nTotal))
        .select(col("id"),
          expr(s"$Teleport / CAST(n AS DOUBLE) + $Damping * COALESCE(s, 0.0D)").as("rank"))
        .localCheckpoint(false)
    }
    rank.orderBy(col("id")).select(col("id").as("c_custkey"), col("rank"))
  }

  val qPagerankSql: String = {
    val iters = (1 to PrIters).map { k =>
      s"""c$k AS (SELECT e.dst, CAST(SUM(CAST(r${k - 1}.rank / CAST(o.outdeg AS DOUBLE) AS DECIMAL(38,15))) AS DOUBLE) AS s
         |  FROM edges e JOIN r${k - 1} ON r${k - 1}.id = e.src JOIN outdeg o ON o.src = e.src
         |  GROUP BY e.dst),
         |r$k AS (SELECT n.id, $Teleport / CAST(t.n AS DOUBLE) + $Damping * COALESCE(c$k.s, 0.0) AS rank
         |  FROM nodes n LEFT JOIN c$k ON c$k.dst = n.id, tot t)""".stripMargin
    }.mkString(",\n")
    s"""WITH nodes AS (SELECT c_custkey AS id FROM customer),
       |edges AS (SELECT id AS src, id // 7 AS dst FROM nodes WHERE id >= 7),
       |outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
       |tot AS (SELECT COUNT(*) AS n FROM nodes),
       |r0 AS (SELECT id, 1.0 / CAST(t.n AS DOUBLE) AS rank FROM nodes, tot t),
       |$iters
       |SELECT id AS c_custkey, rank FROM r$PrIters ORDER BY c_custkey""".stripMargin
  }

  /** The q_triangles order-date slice — 3 months bounds the co-purchase
    * edge set while leaving a dense-enough graph for real triangles. */
  private val TriLo = "1997-01-01"; private val TriHi = "1997-04-01"

  /** q_triangles: triangle census of the co-purchase graph (parts that
    * share an order) — the join-explosive graph workload: distinct a<b
    * edges, wedge join (a<b<c sharing b... here a<b, b<c on matching b),
    * closure semi-join, plus the global clustering coefficient
    * 3·triangles/wedges. All-integer counts; the only double is one
    * pinned division. Scale shape: edge build is one orderkey-keyed
    * self-join with the a<b guard; the wedge join's fan-out is bounded
    * by per-vertex degree (the month slice is the gate's degree knob —
    * production would pre-filter hub vertices exactly like the LSH
    * bucket caps). */
  def qTriangles(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).join(
        Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit(s"$TriLo 00:00:00").cast("timestamp_ntz") &&
            col("o_orderdate") < lit(s"$TriHi 00:00:00").cast("timestamp_ntz"))
          .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
    val edges = li.select(col("ok"), col("p").as("a"))
      .join(li.select(col("ok"), col("p").as("b")), "ok")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
      .localCheckpoint(false)
    val wedges = edges.select(col("a"), col("b").as("m"))
      .join(edges.select(col("a").as("m"), col("b").as("c")), "m")
      .select(col("a"), col("m"), col("c"))
    val triangles = wedges.join(edges.select(col("a"), col("b").as("c")), Seq("a", "c"))
    val nNodes = edges.select(col("a").as("v")).unionByName(edges.select(col("b").as("v")))
      .distinct().count()
    edges.agg(count(lit(1)).as("n_edges"))
      .crossJoin(wedges.agg(count(lit(1)).as("n_wedges")))
      .crossJoin(triangles.agg(count(lit(1)).as("n_triangles")))
      .select(lit(nNodes).as("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        (lit(3.0) * col("n_triangles").cast("double") /
          greatest(col("n_wedges"), lit(1L)).cast("double")).as("clustering"))
  }

  val qTrianglesSql: String =
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE o_orderdate >= TIMESTAMP '$TriLo' AND o_orderdate < TIMESTAMP '$TriHi'),
       |edges AS (
       |  SELECT DISTINCT x.p AS a, y.p AS b
       |  FROM li x JOIN li y ON x.ok = y.ok AND x.p < y.p),
       |wedges AS (
       |  SELECT e1.a, e1.b AS m, e2.b AS c
       |  FROM edges e1 JOIN edges e2 ON e2.a = e1.b),
       |tris AS (
       |  SELECT w.a, w.m, w.c FROM wedges w JOIN edges e ON e.a = w.a AND e.b = w.c),
       |verts AS (SELECT COUNT(DISTINCT v) AS n_nodes FROM
       |  (SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges))
       |SELECT v.n_nodes,
       |  (SELECT COUNT(*) FROM edges) AS n_edges,
       |  (SELECT COUNT(*) FROM wedges) AS n_wedges,
       |  (SELECT COUNT(*) FROM tris) AS n_triangles,
       |  3.0 * CAST((SELECT COUNT(*) FROM tris) AS DOUBLE) /
       |    CAST(greatest((SELECT COUNT(*) FROM wedges), 1) AS DOUBLE) AS clustering
       |FROM verts v""".stripMargin

  /** q_basket: association rules over the co-purchase slice (market
    * basket / frequent-itemset mining, the Apriori output surface):
    * pair supports from the same distinct (order, part) build as
    * q_triangles, per-item supports, and for every pair above the
    * min-support cut: support, confidence and lift — lift's numerator
    * and denominator are exact integer PRODUCTS (n_ab·N and n_a·n_b), so
    * the only float op is one pinned division. Top-20 by lift. */
  def qBasket(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).join(
        Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit(s"$TriLo 00:00:00").cast("timestamp_ntz") &&
            col("o_orderdate") < lit(s"$TriHi 00:00:00").cast("timestamp_ntz"))
          .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
      .localCheckpoint(false)
    val nOrders = li.select(col("ok")).distinct().count()
    val item = li.groupBy(col("p")).agg(count(lit(1)).as("n_item"))
    val pairs = li.select(col("ok"), col("p").as("a"))
      .join(li.select(col("ok"), col("p").as("b")), "ok")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 3)
    val scored = pairs
      .join(item.select(col("p").as("a"), col("n_item").as("n_a")), "a")
      .join(item.select(col("p").as("b"), col("n_item").as("n_b")), "b")
      .select(col("a"), col("b"), col("n_ab"),
        (col("n_ab").cast("double") / lit(nOrders).cast("double")).as("support"),
        (col("n_ab").cast("double") / col("n_a").cast("double")).as("confidence"),
        ((col("n_ab") * lit(nOrders)).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("lift").desc, col("a"), col("b"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 20)
      .select(col("rnk"), col("a"), col("b"), col("n_ab"),
        col("support"), col("confidence"), col("lift"))
      .orderBy(col("rnk"))
  }

  val qBasketSql: String =
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE o_orderdate >= TIMESTAMP '$TriLo' AND o_orderdate < TIMESTAMP '$TriHi'),
       |n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM li),
       |item AS (SELECT p, COUNT(*) AS n_item FROM li GROUP BY p),
       |pairs AS (
       |  SELECT x.p AS a, y.p AS b, COUNT(*) AS n_ab
       |  FROM li x JOIN li y ON x.ok = y.ok AND x.p < y.p
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
       |scored AS (
       |  SELECT a, b, n_ab,
       |    CAST(n_ab AS DOUBLE) / CAST(n.n_orders AS DOUBLE) AS support,
       |    CAST(n_ab AS DOUBLE) / CAST(ia.n_item AS DOUBLE) AS confidence,
       |    CAST(n_ab * n.n_orders AS DOUBLE) / CAST(ia.n_item * ib.n_item AS DOUBLE) AS lift
       |  FROM pairs
       |  JOIN item ia ON ia.p = a JOIN item ib ON ib.p = b, n)
       |SELECT rnk, a, b, n_ab, support, confidence, lift FROM (
       |  SELECT *, ROW_NUMBER() OVER (ORDER BY lift DESC, a, b) AS rnk FROM scored)
       |WHERE rnk <= 20 ORDER BY rnk""".stripMargin

  private val LpIters = 3

  /** q_label_prop: synchronous label-propagation community detection
    * over the co-purchase graph (same distinct (order, part) slice as
    * q_triangles, both edge directions) — the community-mining workload
    * next to PageRank and triangles. Fully deterministic variant: labels
    * start as vertex ids; each round every vertex adopts the MINIMUM
    * label among its neighbors' most-frequent labels (count desc, label
    * asc — the tie-break that makes sync LPA reproducible). Output is
    * the top-25 communities by size. Scale shape per round: one
    * neighbor join (edge-keyed) + one (v,label) count whose per-vertex
    * argmax window reuses the count's clustering — work ∝ |E| per
    * round, label frames localCheckpoint like every iterative operator
    * here; at 100 TB the hub pre-filter knob from q_triangles bounds
    * degree before the first round. */
  def qLabelProp(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).join(
        Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit(s"$TriLo 00:00:00").cast("timestamp_ntz") &&
            col("o_orderdate") < lit(s"$TriHi 00:00:00").cast("timestamp_ntz"))
          .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
    val und = li.select(col("ok"), col("p").as("a"))
      .join(li.select(col("ok"), col("p").as("b")), "ok")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    val edges = und.select(col("a").as("v"), col("b").as("nbr"))
      .unionByName(und.select(col("b").as("v"), col("a").as("nbr")))
      .localCheckpoint(false)
    var labels = edges.select(col("v")).distinct()
      .select(col("v"), col("v").as("label")).localCheckpoint(false)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("v")).orderBy(col("n").desc, col("label"))
    for (_ <- 1 to LpIters) {
      val cnt = edges
        .join(labels.select(col("v").as("nbr"), col("label")), "nbr")
        .groupBy(col("v"), col("label")).agg(count(lit(1)).as("n"))
      labels = cnt.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("v"), col("label")).localCheckpoint(false)
    }
    val comm = labels.groupBy(col("label")).agg(count(lit(1)).as("size"))
    val wTop = org.apache.spark.sql.expressions.Window
      .orderBy(col("size").desc, col("label"))
    comm.withColumn("rnk", row_number().over(wTop)).filter(col("rnk") <= 25)
      .select(col("rnk"), col("label"), col("size"))
      .orderBy(col("rnk"))
  }

  val qLabelPropSql: String = {
    val iters = (1 to LpIters).map { k =>
      s"""c$k AS (SELECT e.v, l.label, COUNT(*) AS n
         |  FROM edges e JOIN l${k - 1} l ON l.v = e.nbr GROUP BY 1, 2),
         |l$k AS (SELECT v, label FROM (
         |    SELECT v, label, ROW_NUMBER() OVER (PARTITION BY v ORDER BY n DESC, label) AS rn
         |    FROM c$k) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE o_orderdate >= TIMESTAMP '$TriLo' AND o_orderdate < TIMESTAMP '$TriHi'),
       |und AS (
       |  SELECT DISTINCT x.p AS a, y.p AS b
       |  FROM li x JOIN li y ON x.ok = y.ok AND x.p < y.p),
       |edges AS (SELECT a AS v, b AS nbr FROM und UNION ALL SELECT b, a FROM und),
       |l0 AS (SELECT v, v AS label FROM (SELECT DISTINCT v FROM edges)),
       |$iters,
       |comm AS (SELECT label, COUNT(*) AS size FROM l$LpIters GROUP BY label)
       |SELECT rnk, label, size FROM (
       |  SELECT label, size, ROW_NUMBER() OVER (ORDER BY size DESC, label) AS rnk FROM comm)
       |WHERE rnk <= 25 ORDER BY rnk""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank"   -> qPagerank _,
    "q_triangles"  -> qTriangles _,
    "q_basket"     -> qBasket _,
    "q_label_prop" -> qLabelProp _,
  )

  val oracle: Map[String, String] = Map(
    "q_pagerank"   -> qPagerankSql,
    "q_triangles"  -> qTrianglesSql,
    "q_basket"     -> qBasketSql,
    "q_label_prop" -> qLabelPropSql,
  )
}
