package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CdcApply
import graft.similarity.Kmeans

class KmeansCdcSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("CdcApply: last change wins, deletes drop out, other ops ignored") {
    val log = Seq(
      (1L, "I", 10L, 1L, 1.0), (1L, "U", 20L, 2L, 2.0),          // final U -> 2.0
      (2L, "I", 10L, 3L, 5.0), (2L, "D", 30L, 4L, 0.0),          // deleted
      (3L, "I", 10L, 5L, 7.0), (3L, "X", 99L, 6L, 9.9),          // X ignored
      (4L, "U", 15L, 7L, 4.0), (4L, "U", 15L, 8L, 6.0))          // tie -> higher id
      .toDF("k", "op", "ts", "id", "v")
    val out = CdcApply(log, Seq("k"), "op", "ts", "id", Seq("v"))
      .select("k", "v").as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 2.0, 3L -> 7.0, 4L -> 6.0))
  }

  test("CdcApply.foldState: tombstones shadow late arrivals, then expire below the horizon") {
    import org.apache.spark.sql.functions.lit
    val b1 = Seq((1L, "I", 10L, 1L, 1.0), (2L, "D", 30L, 2L, 0.0)).toDF("k", "op", "ts", "id", "v")
    val b2 = Seq((2L, "U", 20L, 3L, 9.0)).toDF("k", "op", "ts", "id", "v") // LATE: older than the delete
    val s1 = CdcApply.foldState(None, b1, Seq("k"), "op", "ts", "id", Seq("v"))
    val s2 = CdcApply.foldState(Some(s1), b2, Seq("k"), "op", "ts", "id", Seq("v"))
    val live = CdcApply.liveView(s2, Seq("k"), "op", "ts", Seq("v"))
      .select("k").as[Long].collect().toSet
    assert(live == Set(1L), "the kept tombstone must shadow the late update")
    // horizon at ts=31: no change older than 31 can still arrive, so the
    // delete (ts=30) has nothing left to shadow and leaves state
    val s3 = CdcApply.foldState(Some(s2),
      b2.filter(lit(false)), Seq("k"), "op", "ts", "id", Seq("v"),
      tombstoneHorizon = Some(lit(31L)))
    assert(s3.filter($"op" === "D").count() == 0, "expired tombstone must drop")
    assert(s3.count() == 1)
  }

  test("VectorDecimalSum: exact vs BigDecimal reference, partitioning-invariant, one agg column at dim=512") {
    import org.apache.spark.sql.graftshim.ColumnBridge
    val dim = 512
    val rows = (0 until 300).map { i =>
      (i % 7).toLong -> Array.tabulate(dim)(j => ((i * 31 + j * 17) % 1000) / 7.0)
    }
    val df = rows.toDF("g", "v")
    def sums(parts: Int): Map[Long, Seq[Double]] = {
      val c = ColumnBridge.column(graft.functions.VectorDecimalSum(
        ColumnBridge.expression(col("v")), dim).toAggregateExpression())
      df.repartition(parts).groupBy(col("g")).agg(c.as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    }
    val s1 = sums(1); val s13 = sums(13)
    assert(s1 == s13, "decimal vector sum must not depend on partitioning")
    // exact reference via BigDecimal with the same entry rounding
    val ref = rows.groupBy(_._1).map { case (g, vs) =>
      g -> (0 until dim).map { j =>
        vs.map(v => java.math.BigDecimal.valueOf(v._2(j))
            .setScale(12, java.math.RoundingMode.HALF_UP))
          .reduce(_.add(_)).doubleValue()
      }
    }
    assert(s1 == ref)
  }

  test("Kmeans: separable clusters recovered, partitioning-invariant centroids") {
    val pts = (0 until 60).map { i =>
      val base = if (i % 2 == 0) 0.0f else 10.0f
      (i.toLong, Array(base + (i % 7) * 0.01f, base - (i % 5) * 0.01f))
    }
    val df = pts.toDF("vec_id", "embedding")
    val c1 = Kmeans.fit(spark, df.repartition(1), "vec_id", "embedding", k = 2, iters = 5)
      .orderBy("c_id").select("c_vec").as[Array[Double]].collect()
    val c2 = Kmeans.fit(spark, df.repartition(7), "vec_id", "embedding", k = 2, iters = 5)
      .orderBy("c_id").select("c_vec").as[Array[Double]].collect()
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq,
      "decimal-sum centroids must not depend on partitioning")
    val centers = c1.map(_.head).sorted
    assert(math.abs(centers(0) - 0.03) < 0.1 && math.abs(centers(1) - 10.03) < 0.1,
      s"clusters not recovered: ${centers.toSeq}")
  }
}
