package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BandedRank

/** BandedRank must be VALUE-IDENTICAL to the flat per-group window it
  * replaces (the q_spearman / q_mann_whitney / q_ks_test rewrite, VERDICT
  * r12 #1) — the banding is purely a physical decomposition. Pinned here
  * against Spark's own flat windows on data with heavy ties, negative
  * values, degenerate groups, and across partitioning changes. */
class BandedRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Deterministic pseudo-random rows: (group, value) with heavy ties
    * (values quantized), one all-equal group, one single-row group. */
  private def fixture = {
    val rows = (1 to 997).map { i =>
      val g = i % 7
      val v = ((i * 2654435761L) % 40).toDouble / 4.0 - 3.0 // ties + negatives
      (g, v)
    } ++ Seq((7, 1.0), (7, 1.0), (7, 1.0), (8, 42.0)) // degenerate groups
    rows.toDF("g", "v")
  }

  test("withMinRanks equals the flat RANK() window, ties and degenerate groups included") {
    val df = fixture
    val flat = df.withColumn("rk",
      rank().over(Window.partitionBy(col("g")).orderBy(col("v"))).cast("long"))
    val banded = BandedRank.withMinRanks(df, Seq("g"), Seq("v" -> "rk"))
    val a = flat.groupBy("g", "v").agg(min("rk").as("rk"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getDouble(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val b = banded.groupBy("g", "v").agg(min("rk").as("rk"), max("rk").as("rk2"), count(lit(1)).as("n"))
      .collect()
    assert(b.nonEmpty)
    b.foreach { r =>
      val key = (r.getInt(0), r.getDouble(1))
      assert(r.getLong(2) == r.getLong(3), s"tied rows at $key must share one min-rank")
      assert((r.getLong(2), r.getLong(4)) == a(key), s"banded rank differs from flat at $key")
    }
  }

  test("withMinRanks: two value columns in one call rank independently and exactly") {
    val df = fixture.withColumn("w", -col("v") * lit(3.0) + (col("g") % 3).cast("double"))
    val flat = df
      .withColumn("rv", rank().over(Window.partitionBy(col("g")).orderBy(col("v"))).cast("long"))
      .withColumn("rw", rank().over(Window.partitionBy(col("g")).orderBy(col("w"))).cast("long"))
    val banded = BandedRank.withMinRanks(df, Seq("g"), Seq("v" -> "rv", "w" -> "rw"))
    val key = (d: org.apache.spark.sql.DataFrame) =>
      d.select(sum(col("rv") * col("rv") + col("rw") * lit(7)).cast("decimal(38,0)"))
        .as[java.math.BigDecimal].head()
    assert(key(banded) == key(flat), "both rank columns must match the flat windows")
  }

  test("withPrefixSums equals the flat cumulative window on a collapsed frame; repartition-invariant") {
    val g = fixture.groupBy("g", "v")
      .agg(count(lit(1)).as("c1"), sum(when(col("v") > 0, 1L).otherwise(0L)).as("c2"))
    val flatW = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flat = g.withColumn("cum1", sum(col("c1")).over(flatW))
      .withColumn("cum2", sum(col("c2")).over(flatW))
      .select("g", "v", "cum1", "cum2").collect()
      .map(r => (r.getInt(0), r.getDouble(1)) -> (r.getLong(2), r.getLong(3))).toMap
    Seq(g.repartition(3), g.repartition(11)).foreach { input =>
      val got = BandedRank.withPrefixSums(input, Seq("g"), "v",
        Seq("c1" -> "cum1", "c2" -> "cum2"))
        .select("g", "v", "cum1", "cum2").collect()
      assert(got.length == flat.size)
      got.foreach { r =>
        val key = (r.getInt(0), r.getDouble(1))
        assert((r.getLong(2), r.getLong(3)) == flat(key),
          s"banded prefix sums differ from the flat window at $key")
      }
    }
  }
}
