package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
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
  */
object MinHashLsh {
  val Bands = 4
  val Rows = 6
  val NumHashes: Int = Bands * Rows

  /** doc_id + sig_0..sig_{n-1} minhash signature columns. All signatures
    * come from ONE codegen'd pass (MinHashSigs) over the hashed shingles. */
  def signatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // CPU-bound narrow map: spread across all cores even when the input is
    // one small parquet split (the tiny row shuffle is free by comparison)
    val spread = docs.repartition(
      docs.sparkSession.sparkContext.defaultParallelism, col(idCol))
    val hashed = transform(shingles3(tokens(col(textCol))), s => baseHashes(s))
    val sigCols = (0 until NumHashes).map(i => get(col("__sigs"), lit(i)).as(s"sig_$i"))
    spread.withColumn("__sigs",
      org.apache.spark.sql.graftshim.ColumnBridge.column(VectorExpressions.MinHashSigs(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(hashed), NumHashes, P)))
      .select(col(idCol) +: sigCols: _*)
  }

  /** Band key: band index + the band's r signature values, concatenated. */
  def bandKey(band: Int): Column =
    concat_ws(",", lit(band.toString) +:
      (band * Rows until (band + 1) * Rows).map(i => col(s"sig_$i")): _*)

  /** Candidate near-duplicate pairs (a_id < b_id), via band-bucket self-join. */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sigs = signatures(docs, idCol, textCol)
    val bands = sigs.select(col(idCol),
      explode(array((0 until Bands).map(bandKey): _*)).as("bk"))
    val a = bands.select(col(idCol).as("a_id"), col("bk"))
    val b = bands.select(col(idCol).as("b_id"), col("bk"))
    a.join(b, Seq("bk")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
  }
}
