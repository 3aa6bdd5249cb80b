package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Salting

/** Specs for the cluster-scale tools: salted skew joins and bucketed
  * co-located joins (bucketing = the zero-shuffle join path for repeatedly
  * joined big tables). */
class ScaleToolsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("GraftExtensions injects every native function: pure SQL works with no Scala registration") {
    // a brand-new session sharing only the extension config — proves the
    // spark.sql.extensions path alone provides the functions
    val s2 = spark.newSession()
    val r = s2.sql(
      """SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |  dot_product(array(2.0D, 3.0D), array(4.0D, 5.0D)) AS d,
        |  simhash64(array(1L)) AS sh,
        |  rolling_hash_min('abc') AS rh""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 23.0)
    // simhash of one hash h: bit i set iff bit i of h set -> simhash(1)=1
    assert(r.getLong(2) == 1L)
    // 'abc' shorter than the 16-byte window: one window over the whole
    // string, h = ((97*257+98)*257+99) mod 1e9+7
    assert(r.getLong(3) == ((97L * 257 + 98) * 257 + 99) % 1000000007L)
  }

  test("saltedJoin returns exactly the plain join's rows") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) 1 else i, s"v$i")).toDF("k", "payload")
    val small = Seq((1, "hot"), (2, "cold"), (555, "x")).toDF("k", "attr")
    val plain = big.join(small, "k").select("k", "payload", "attr")
      .as[(Int, String, String)].collect().sorted
    val salted = Salting.saltedJoin(big, small, "k", factor = 8)
      .select("k", "payload", "attr").as[(Int, String, String)].collect().sorted
    assert(salted.sameElements(plain))
  }

  test("saltedJoin splits the hot key across multiple partitions") {
    val big = (1 to 10000).map(_ => (7, "hot-row")).toDF("k", "payload")
    val small = Seq((7, "dim")).toDF("k", "attr")
    val joined = Salting.saltedJoin(big, small, "k", factor = 16)
    assert(joined.count() == 10000)
    // the salt must actually spread the single hot key — even when every
    // row of it is bit-identical
    val nSalts = big
      .withColumn("s", pmod(xxhash64(monotonically_increasing_id()), lit(16)))
      .select("s").distinct().count()
    assert(nSalts > 4)
  }

  test("bucketed tables join without a shuffle exchange") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    val dir = "/root/testdata/sf0.001"
    Tables.lineitem(s2, dir).write.bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").mode("overwrite").saveAsTable("li_b")
    Tables.orders(s2, dir).write.bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").mode("overwrite").saveAsTable("ord_b")
    val joined = s2.table("li_b")
      .join(s2.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).count()
    joined.collect()
    // bucketing co-locates both sides: the join itself needs NO exchange —
    // the only allowed shuffle is the final groupBy. (AQE's toString echoes
    // the initial plan too; count only the final section.)
    val p = joined.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(p.contains("SortMergeJoin"), p.take(1500))
    assert(p.contains("Bucketed: true"), "scans must be bucketed")
    assert(exchanges <= 1, s"join should be exchange-free:\n$p")
  }
}
