package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The corpus-build bootstrap classifier (gate-verified as t_classify):
  * train per-token integer weights on a cheap seed label, apply
  * corpus-wide. Weights are the centroid-difference cross products
  * occ_good·M_bad − occ_bad·M_good — the scaled form of
  * Σ c_t·(P(t|good) − P(t|bad)) with no logs or division, so training and
  * inference are exact integer arithmetic and bit-reproducible under any
  * partitioning.
  *
  * Scale: ONE exploded token pass feeds both training and inference; the
  * weight table is vocab-sized (broadcast when it fits, token-keyed
  * shuffle join otherwise); corpus masses are a 1-row broadcast. The cross
  * products are computed in decimal(38,0) — exact up to 10^38, far past
  * any corpus's occ·mass product — and the cast back to the long output
  * is GUARDED: a value outside long range raises instead of wrapping, so
  * a weight can flip sign only by a loud failure, never silently.
  */
object QualityClassifier {

  /** decimal → long with a loud failure outside long range (two's-
    * complement wrap would silently flip the decision sign). */
  private def longExact(c: org.apache.spark.sql.Column, what: String) =
    when(c.between(lit(Long.MinValue).cast("decimal(38,0)"),
        lit(Long.MaxValue).cast("decimal(38,0)")), c.cast("long"))
      .otherwise(raise_error(concat(lit(s"QualityClassifier: $what overflows " +
        "long — rescale masses by a common power of two (sign-invariant): "),
        c.cast("string"))))

  /** Per-document integer score: docs must carry (idCol, toksCol:
    * array<string>, seedCol: 0/1 int). Docs whose every token is empty
    * are absent from the result — callers left-join and coalesce to 0. */
  def scores(docs: DataFrame, idCol: String, toksCol: String, seedCol: String): DataFrame = {
    val tok = docs
      .select(col(idCol), col(seedCol).as("__s"), explode(col(toksCol)).as("__t"))
      .filter(col("__t") =!= "")
    val totals = tok.agg(sum(col("__s")).as("__g"), sum(lit(1) - col("__s")).as("__b"))
    val margin = col("__dg").cast("decimal(38,0)") * col("__b") -
      col("__db").cast("decimal(38,0)") * col("__g")
    val votes = tok.groupBy(col("__t"))
      .agg(sum(col("__s")).as("__dg"), sum(lit(1) - col("__s")).as("__db"))
      .crossJoin(broadcast(totals))
      .select(col("__t"), longExact(margin, "token margin").as("__v"))
    tok.join(votes, "__t")
      .groupBy(col(idCol))
      .agg(longExact(sum(col("__v").cast("decimal(38,0)")), "document score")
        .as("clf_score"))
  }
}
