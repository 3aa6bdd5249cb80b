package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit pin for the bootstrap classifier's exact integer arithmetic: the
  * centroid-difference cross products on a hand-computable corpus, and the
  * guarantee that out-of-long-range arithmetic RAISES instead of wrapping
  * (a two's-complement wrap would silently flip weight signs). */
class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("scores: hand-computed margins — dg*B − db*G summed per doc") {
    val docs = Seq(
      (1L, Seq("good", "nice", "day"), 1),
      (2L, Seq("good", "fine"), 1),
      (3L, Seq("bad", "ugly", "day"), 0),
      (4L, Seq("bad", "worse"), 0)
    ).toDF("doc_id", "toks", "seed")
    // G = B = 5 token occurrences; margins: good 2*5=10, nice/fine 5,
    // day 1*5-1*5=0, bad -10, ugly/worse -5
    val out = graft.operators.QualityClassifier
      .scores(docs, "doc_id", "toks", "seed")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 15L, 2L -> 15L, 3L -> -15L, 4L -> -15L), s"got $out")
  }

  test("scores: empty-token rows drop; ties score zero") {
    val docs = Seq(
      (1L, Seq("x", ""), 1),
      (2L, Seq("x"), 0)
    ).toDF("doc_id", "toks", "seed")
    // x: dg=1 db=1, G=B=1 → margin 0 for both docs
    val out = graft.operators.QualityClassifier
      .scores(docs, "doc_id", "toks", "seed")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L))
  }

  test("out-of-long-range decimal raises instead of wrapping") {
    // exercise the guard itself: a decimal past Long.MaxValue must raise
    val big = Seq(1L).toDF("id")
      .select(lit("92233720368547758080").cast("decimal(38,0)").as("v")) // 10*Long.Max
    val guarded = big.select(
      when(col("v").between(lit(Long.MinValue).cast("decimal(38,0)"),
          lit(Long.MaxValue).cast("decimal(38,0)")), col("v").cast("long"))
        .otherwise(raise_error(concat(lit("overflow: "), col("v").cast("string"))))
        .as("out"))
    val e = intercept[Exception] { guarded.collect() }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.toString + msgs(t.getCause)
    assert(msgs(e).contains("overflow"), s"expected loud overflow, got $e")
  }
}
