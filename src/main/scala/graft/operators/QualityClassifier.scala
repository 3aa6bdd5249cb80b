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
  * shuffle join otherwise); corpus masses are a 1-row broadcast. At corpus
  * scale the cross products outgrow 64 bits — rescale both masses by a
  * common power of two (the decision sign is invariant) or widen to
  * decimal(38,0).
  */
object QualityClassifier {

  /** Per-document integer score: docs must carry (idCol, toksCol:
    * array<string>, seedCol: 0/1 int). Docs whose every token is empty
    * are absent from the result — callers left-join and coalesce to 0. */
  def scores(docs: DataFrame, idCol: String, toksCol: String, seedCol: String): DataFrame = {
    val tok = docs
      .select(col(idCol), col(seedCol).as("__s"), explode(col(toksCol)).as("__t"))
      .filter(col("__t") =!= "")
    val totals = tok.agg(sum(col("__s")).as("__g"), sum(lit(1) - col("__s")).as("__b"))
    val margin = col("__dg") * col("__b") - col("__db") * col("__g")
    val votes = tok.groupBy(col("__t"))
      .agg(sum(col("__s")).as("__dg"), sum(lit(1) - col("__s")).as("__db"))
      .crossJoin(broadcast(totals))
      .select(col("__t"), margin.cast("long").as("__v"))
    tok.join(votes, "__t")
      .groupBy(col(idCol)).agg(sum(col("__v")).as("clf_score"))
  }
}
