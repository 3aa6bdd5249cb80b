package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** SimHash near-duplicate detection (SURVEY.md §2D).
  *
  * Each document folds its token hashes into one 64-bit signature (native
  * codegen'd SimHash64 expression — single pass, no shuffle). Candidate
  * retrieval uses the pigeonhole banding trick: split the signature into 4
  * 16-bit chunks; any pair within Hamming distance ≤ 3 must agree on at
  * least one chunk, so an equality self-join on (chunk_idx, chunk_value)
  * finds all of them without an O(n²) comparison. The final Hamming check
  * is a codegen'd bit_count(xor).
  *
  * Retrieval here is deliberately COMPLETE (every pair within the Hamming
  * bound, proven against brute force in spec) — the property MinHash's
  * star expansion trades away. The cost is the usual hot-bucket caveat:
  * m documents with IDENTICAL signatures (exact boilerplate) produce
  * m²/2 hamming-0 pairs. At web scale, collapse exact-duplicate docs to
  * one representative first (Dedup.contentHash groups / fuzzyCanonical's
  * rep map) — identical text is exactly what the cheap exact pass
  * removes, and distinct near-dup signatures then spread across buckets.
  */
object SimHashDedup {
  val Chunks = 4
  val MaxHamming = 3

  /** Token hash: md5-derived 60 bits (15 hex chars), the same construction
    * as TextFunctions.baseHashes — engine-independent, so the whole SimHash
    * pipeline is DuckDB-expressible and gets an exact SQL oracle. Bits
    * 60-63 of every token hash are zero, so the effective signature is 60
    * bits wide; Hamming distances are unaffected. */
  val TokenHashSql = "cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)"

  def signatures(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    VectorExpressions.register(spark)
    // Spark SQL string literals unescape \\ → \, so double the class's
    // backslashes to land the same [ \t\n\r\f]+ regex as the oracle side
    val ws = graft.functions.TextFunctions.Ws.replace("\\", "\\\\")
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol),
        expr(s"simhash64(transform(split(lower(trim($textCol)), '$ws+'), t -> $TokenHashSql))").as("simhash"))
  }

  /** Candidate retrieval + exact Hamming filter over precomputed
    * signatures (idCol, simhash). COMPLETE, not approximate: with c chunks
    * and Hamming ≤ h where h < c, the h flipped bits touch at most h < c
    * chunks, so at least one chunk matches exactly and the equality join
    * retrieves the pair — (Chunks=4, MaxHamming=3) satisfies h ≤ c-1, and
    * DedupSimilaritySpec pins the guarantee against a brute-force oracle.
    *
    * Scaling rule: expected in-bucket pair load is Σ n_b² over buckets ≈
    * c·n²/2^w for chunk width w = 64/c bits — with 16-bit chunks that's
    * ~n/65536 docs per bucket, quadratic in n beyond ~10⁸ docs. Grow the
    * signature (e.g. 128-bit → w=32 at c=4) or raise c (keeping h ≤ c-1,
    * which widens retrieval but shrinks w) to hold bucket sizes flat. */
  def pairsFromSignatures(sigs: DataFrame, idCol: String): DataFrame = {
    val chunked = sigs.select(col(idCol), col("simhash"),
      explode(array((0 until Chunks).map(j =>
        struct(lit(j).as("ci"), shiftrightunsigned(col("simhash"), 16 * j).bitwiseAND(lit(0xFFFFL)).as("cv"))): _*)).as("ch"))
    val a = chunked.select(col(idCol).as("a_id"), col("simhash").as("a_sh"), col("ch"))
    val b = chunked.select(col(idCol).as("b_id"), col("simhash").as("b_sh"), col("ch"))
    a.join(b, "ch").filter(col("a_id") < col("b_id"))
      .withColumn("hamming", bit_count(col("a_sh").bitwiseXOR(col("b_sh"))))
      .filter(col("hamming") <= MaxHamming)
      .select(col("a_id"), col("b_id"), col("hamming")).distinct()
  }

  def pairs(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String): DataFrame =
    pairsFromSignatures(signatures(spark, docs, idCol, textCol), idCol)
}
