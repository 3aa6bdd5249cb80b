package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-11 analytics gates — properties the
  * operators guarantee BY CONSTRUCTION, asserted on real data so a future
  * refactor that silently drops the guarantee fails loudly (the oracle
  * hash-match alone would keep passing if both sides broke the same way). */
class InvariantSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q_apportion: final quotas sum EXACTLY to the slot budget (the Hamilton invariant)") {
    val out = graft.queries.Relational8.qApportion(spark, dir)
    val total = out.agg(sum(col("final_quota"))).as[Long].head()
    assert(total == 1000L, s"quota sum must equal the budget, got $total")
    // base quotas alone must under-allocate (the remainders exist)
    val base = out.agg(sum(col("base_quota"))).as[Long].head()
    assert(base <= 1000L)
    // every extra is 0 or 1 — largest-remainder never grants two
    val badExtra = out.filter(col("extra") < 0 || col("extra") > 1).count()
    assert(badExtra == 0)
  }

  test("q_growth_acct: new + retained + resurrected == actives on every day; churn consistent") {
    val out = graft.queries.Relational8.qGrowthAcct(spark, dir)
      .select(col("n_active"), col("n_new") + col("n_retained") + col("n_resurrected"),
        col("n_churned"))
      .as[(Long, Long, Option[Long])].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (a, s, _) => a == s }, "decomposition identity violated")
    // churn can never be negative: retained(d) <= active(d-1) by definition
    assert(out.forall(_._3.forall(_ >= 0L)), "negative churn")
  }

  test("e_hwm_extract: the two windows PARTITION the table — counts and checksums recompose") {
    val m = graft.queries.Etl3.eHwmExtract(spark, dir)
      .as[(String, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m("w1_upto_mark")._1 + m("w2_after_mark")._1 == m("full_table")._1)
    assert(m("w1_plus_w2") == m("full_table"),
      "recomposed checksum must equal the full table's")
  }

  test("e_hash_chain: exactly the tampered customers break; everyone else's chain is intact") {
    val out = graft.queries.Etl3.eHashChain(spark, dir)
      .select(col("o_custkey"), col("chain_intact")).as[(Long, Boolean)].collect()
    val broken = out.filter(!_._2).map(_._1).toSet
    // the replica tampers orders with o_orderkey % 1009 == 0 — their owners
    val expected = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 1009 === 0)
      .select(col("o_custkey")).distinct().as[Long].collect().toSet
    assert(broken == expected, s"broken=$broken expected=$expected")
  }

  test("q_weighted_median: the crossing price carries at least half the weight on both sides") {
    val rows = graft.queries.Relational8.qWeightedMedian(spark, dir)
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    for ((flag, tot, wm) <- rows) {
      val d18 = org.apache.spark.sql.types.DecimalType(18, 6)
      val li = Tables.lineitem(spark, dir).filter(col("l_returnflag") === flag)
        .select((col("l_extendedprice").cast(d18) * lit(1000000L)).cast("long").as("p"),
          (col("l_quantity").cast(d18) * lit(1000000L)).cast("long").as("w"))
      val wmI = math.round(wm * 1000000.0)
      val below = li.filter(col("p") <= wmI).agg(sum(col("w"))).as[Long].head()
      val above = li.filter(col("p") >= wmI).agg(sum(col("w"))).as[Long].head()
      assert(2 * below >= tot, s"$flag: mass at or below the median is under half")
      assert(2 * above >= tot, s"$flag: mass at or above the median is under half")
    }
  }
}
