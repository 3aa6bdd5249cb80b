package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Z-order (Morton-curve) clustered layout — the multi-column data-skipping
  * lever. Sorting files on ONE column makes its row-group min/max stats
  * selective and every other column's useless; interleaving the bits of
  * several columns' quantile codes gives every participating column
  * locality, so a conjunctive box predicate prunes row groups
  * multiplicatively (a 5% range on each of two columns kills ~99% of row
  * groups instead of ~95% on the sorted one and 0% on the rest).
  *
  * Codes are quantile ranks, not min/max linear scaling: each column is
  * bucketed by its own `2^bits − 1` approxQuantile boundaries, so skewed
  * distributions still spread over the full code range (a linear scale
  * would collapse a heavy-tailed column into one bucket and z-degenerate
  * to a single-column sort). The boundary fetch is one GK-sketch
  * aggregation per call (driver receives ≤255 doubles per column — bounded
  * at any scale); pass `sampleFraction < 1` to bound the sketch's scan cost
  * at 100 TB, where boundary precision is irrelevant beyond bucket grain.
  *
  * Everything row-side is codegen'd Column arithmetic (a fold over the
  * broadcast boundary literal + shift/mask interleave) — no UDF, no
  * shuffle beyond the final range repartition that also fixes file count
  * and file-level stat locality.
  */
object ZOrder {

  /** Quantile-rank code of `c` against sorted boundary values: the count
    * of boundaries ≤ value, a codegen'd fold over the array literal. NULL
    * ranks 0 (sorts first, like Spark's NULLS FIRST). */
  def code(c: Column, bs: Array[Double]): Column =
    aggregate(lit(bs), lit(0),
      (acc, b) => acc + when(c.cast(DoubleType) >= b, 1).otherwise(0))

  /** Interleave `bits` low bits of each code round-robin (Morton order):
    * bit b of code i lands at position b*k + i. */
  def interleave(codes: Seq[Column], bits: Int): Column = {
    val k = codes.size
    val terms = for {
      b <- 0 until bits
      (c, i) <- codes.zipWithIndex
    } yield shiftleft(shiftright(c.cast(LongType), b).bitwiseAND(1L), b * k + i)
    terms.reduce(_ + _)
  }

  /** The z-value column for `cols` of `df` (numeric or castable-to-double
    * columns), boundaries from one approxQuantile pass over
    * `sampleFraction` of the data. */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int = 8,
      sampleFraction: Double = 1.0): Column = {
    require(bits * cols.size <= 62, s"z-value overflows a long: $bits bits x ${cols.size} cols")
    val n = (1 << bits) - 1
    val probs = (1 to n).map(_.toDouble / (n + 1)).toArray
    val basis = if (sampleFraction < 1.0) df.sample(withReplacement = false, sampleFraction, 42L) else df
    val casted = basis.select(cols.map(c => col(c).cast(DoubleType).as(c)): _*)
    val bounds = casted.stat.approxQuantile(cols.toArray, probs, 0.001)
    interleave(cols.zip(bounds).map { case (c, bs) => code(col(c), bs) }, bits)
  }

  /** Write `df` z-clustered on `cols` into `nFiles` range-partitioned,
    * z-sorted zstd parquet files. Writer `options` pass through (e.g.
    * `parquet.block.size` to shrink row groups for testing). */
  def write(df: DataFrame, path: String, cols: Seq[String], nFiles: Int,
      bits: Int = 8, sampleFraction: Double = 1.0,
      options: Map[String, String] = Map.empty): Unit =
    df.withColumn("__z", zvalue(df, cols, bits, sampleFraction))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite")
      .option("compression", "zstd")
      .options(options)
      .parquet(path)
}
