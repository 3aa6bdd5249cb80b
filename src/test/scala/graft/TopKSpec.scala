package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopK

/** The custom per-key top-k physical operator: result equality with the
  * window formulation, and the partial→exchange→final plan shape. */
class TopKSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("TopK.perKey matches the row_number window formulation") {
    val orders = Tables.orders(spark, dir)
    val expected = {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey").as[(String, Long)].collect().toSet
    }
    val got = TopK.perKey(orders, Seq("o_orderpriority"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      .select("o_orderpriority", "o_orderkey").as[(String, Long)].collect().toSet
    assert(got == expected)
  }

  test("plan shape: partial topk below the exchange, final above") {
    val df = TopK.perKey(Tables.orders(spark, dir).repartition(4),
      Seq("o_orderpriority"), Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val nodes = p.linesIterator.filter(_.contains("TopKPerKey ")).toSeq
    assert(nodes.size == 2, s"expected partial+final TopKPerKey:\n$p")
    // tree prints top-down: final (", false") first, partial (", true") below
    assert(nodes.head.contains(", false") && nodes.last.contains(", true"), p)
    val exchangeIdx = p.indexOf("Exchange hashpartitioning")
    assert(exchangeIdx > p.indexOf(", false") && exchangeIdx < p.indexOf(", true"),
      s"key exchange must sit between final and partial:\n$p")
  }

  test("partial-mode key flush keeps results correct under a tiny memory bound") {
    // maxKeysInMemory=2 over ~150 distinct custkeys per partition forces
    // dozens of drains; the final exec must still reduce to the right set.
    // (Plumbed through the logical node — transforming executedPlan would
    // silently no-op under AQE's AdaptiveSparkPlanExec leaf.)
    val orders = Tables.orders(spark, dir).repartition(3)
    val normal = TopK.perKey(orders, Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 2)
      .select("o_custkey", "o_orderkey").as[(Long, Long)].collect().toSet
    val starved = TopK.perKey(orders, Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 2, maxKeysInMemory = 2)
      .select("o_custkey", "o_orderkey").as[(Long, Long)].collect().toSet
    assert(normal.nonEmpty && starved == normal,
      "flushing partial heaps must not change the result")
  }

  test("top-1 per key with duplicate order values is still size-correct") {
    val df = Seq((1, 5.0, "a"), (1, 5.0, "b"), (1, 3.0, "c"), (2, 9.0, "d"))
      .toDF("k", "v", "tag").repartition(3)
    val top = TopK.perKey(df, Seq("k"), Seq(col("v").desc, col("tag").asc), 1)
      .select("k", "tag").as[(Int, String)].collect().toSet
    assert(top == Set((1, "a"), (2, "d")))
  }
}
