package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.VectorExpressions

/** MinHash + LSH banding near-duplicate detection (SURVEY.md §2D).
  *
  * The scale path for fuzzy dedup at 100 TB: signature computation is one
  * narrow map over each document (no shuffle), band keys bucket candidates
  * so the only join is band-key equality — never an O(n²) comparison. With
  * b bands of r rows, a pair of similarity s collides with probability
  * 1-(1-s^r)^b; the defaults (b=4, r=6) target the s>0.8 near-dup regime.
  *
  * Hashing is Carter–Wegman over two md5-derived base hashes
  * (h1 + i*h2 mod P), so the whole signature needs ONE md5 per shingle —
  * engine-independent and 12× cheaper than per-permutation hashing.
  *
  * Candidate generation is STAR EXPANSION, not all-pairs: inside each band
  * bucket every member pairs with the bucket's min id only, so a hot band
  * of m colliding docs (web boilerplate clusters reach 10⁵–10⁶ members)
  * emits m−1 edges instead of m²/2 pairs — linear output, no straggler
  * task. A connected-components consumer sees every bucket member joined
  * through the bucket min; callers that Jaccard-verify the edges should
  * collapse exact-duplicate groups to one representative first (see
  * Dedup.fuzzyCanonical) so identical docs can never be split by a failed
  * bucket-min verification.
  */
object MinHashLsh {
  val Bands = 4
  val Rows = 6
  val NumHashes: Int = Bands * Rows

  /** doc_id + sig_0..sig_{n-1} minhash signature columns (plus any `carry`
    * columns passed through untouched). All signatures come from ONE
    * codegen'd pass (MinHashSigs) over the hashed shingles. */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
      carry: Seq[String] = Nil): DataFrame = {
    // CPU-bound narrow map: spread across all cores even when the input is
    // one small parquet split (the tiny row shuffle is free by comparison)
    val spread = docs.repartition(
      docs.sparkSession.sparkContext.defaultParallelism, col(idCol))
    val hashed = transform(shingles3(tokens(col(textCol))), s => baseHashes(s))
    val sigCols = (0 until NumHashes).map(i => get(col("__sigs"), lit(i)).as(s"sig_$i"))
    spread.withColumn("__sigs",
      org.apache.spark.sql.graftshim.ColumnBridge.column(VectorExpressions.MinHashSigs(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(hashed), NumHashes, P)))
      .select((col(idCol) +: carry.map(col)) ++ sigCols: _*)
  }

  /** Band key: band index + the band's r signature values, concatenated. */
  def bandKey(band: Int): Column =
    concat_ws(",", lit(band.toString) +:
      (band * Rows until (band + 1) * Rows).map(i => col(s"sig_$i")): _*)

  private def banded(sigs: DataFrame, keep: Seq[Column]): DataFrame =
    sigs.select(keep :+ explode(array((0 until Bands).map(bandKey): _*)).as("bk"): _*)

  /** Candidate near-duplicate edges (a_id < b_id) via band-bucket star
    * expansion: each bucket member pairs with the bucket's min id. Output
    * is linear in bucket size (see the class note); one bk-keyed shuffle
    * for the per-bucket min, one edge-sized shuffle for distinct. */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bands = banded(signatures(docs, idCol, textCol), Seq(col(idCol)))
    bands
      .withColumn("a_id", min(col(idCol)).over(Window.partitionBy(col("bk"))))
      .filter(col(idCol) =!= col("a_id"))
      .select(col("a_id"), col(idCol).as("b_id"))
      .distinct()
  }

  /** Cross-group candidate edges for bipartite probes (train/test
    * decontamination): within each band bucket every LEFT doc pairs with
    * the bucket's min RIGHT doc and vice versa, so every doc colliding
    * with the opposite group gains at least one cross-side witness edge
    * while output stays linear in bucket size. `sideCol` must evaluate
    * per-row to 1 (left), 2 (right) or null (excluded — excluded docs
    * are dropped before signature compute). Output: (left_id, right_id). */
  def bipartiteCandidates(docs: DataFrame, idCol: String, textCol: String,
      sideCol: Column): DataFrame = {
    val sided = docs.withColumn("__side", sideCol).filter(col("__side").isNotNull)
    val bands = banded(signatures(sided, idCol, textCol, carry = Seq("__side")),
      Seq(col(idCol), col("__side")))
    val w = Window.partitionBy(col("bk"))
    val withMins = bands
      .withColumn("__ml", min(when(col("__side") === 1, col(idCol))).over(w))
      .withColumn("__mr", min(when(col("__side") === 2, col(idCol))).over(w))
    val fromLeft = withMins.filter(col("__side") === 1 && col("__mr").isNotNull)
      .select(col(idCol).as("left_id"), col("__mr").as("right_id"))
    val fromRight = withMins.filter(col("__side") === 2 && col("__ml").isNotNull)
      .select(col("__ml").as("left_id"), col(idCol).as("right_id"))
    fromLeft.union(fromRight).distinct()
  }
}
