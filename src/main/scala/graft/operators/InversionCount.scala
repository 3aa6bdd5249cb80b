package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Ckpt._

/** Distributed EXACT discordant-pair count (2-D dominance) via DOUBLE
  * value banding — the scale path for Kendall-τ-class statistics that the
  * flat pair join (O(n²) rows) cannot carry past ~10⁵ points.
  *
  * Problem: D = Σ_{(i,j): x_i < x_j ∧ y_i > y_j} c_i·c_j over a collapsed
  * (x, y, c) frame (distinct (x,y), positive counts). A self-join on the
  * inequality materializes every pair; a single sort-merge inversion
  * count is one task. The banded decomposition splits D by the BAND
  * relation of the pair — banding is weakly monotone (BandedRank.bandOf),
  * so bx_i < bx_j ⟹ x_i < x_j STRICTLY (equal values share a band), and
  * the four cases partition the pair set exactly:
  *
  *   1. bx< ∧ by>  — both coarse: counted on the ≤Bx·By-row band GRID,
  *                   G(cell)·H(cell) with H a 2-D dominance sum over the
  *                   grid itself (no row-level pairs at all).
  *   2. bx< ∧ by=  — same y-band strip: row-level pairs ONLY within one
  *                   y-band, equi-joined on the band key (never a
  *                   cartesian), inequality as join filter.
  *   3. bx= ∧ by>  — same x-band strip, symmetric.
  *   4. bx= ∧ by=  — same cell: pairs within one (bx, by) cell.
  *
  * Pair work drops from n²/2 to ≈ n²·(1/Bx + 1/By + 1/(BxBy))/2 plus a
  * Bx²By²-pair grid join (bounded, broadcast) — with Bx = By = B, an
  * O(n²/B) shuffle-partitioned workload whose knob is the usual
  * BandedRank rule: raise B until a strip's pair set fits a task
  * (B ≈ n^(2/3) equalizes strip and grid work). All counts accumulate in
  * DECIMAL(38,0); ANSI-loud past 10³⁸ pairs.
  */
object InversionCount {

  private val d19 = DecimalType(19, 0)
  private val d38 = DecimalType(38, 0)

  /** One-row frame `d` = the exact discordant-pair count of `df`, a
    * collapsed (xCol, yCol, cCol) frame with DISTINCT (x, y) rows. */
  def discordant(df: DataFrame, xCol: String, yCol: String, cCol: String,
      bands: Int = 16): DataFrame = {
    val spark = df.sparkSession
    val bounds = df.agg(
      min(col(xCol).cast("double")).as("xlo"), max(col(xCol).cast("double")).as("xhi"),
      min(col(yCol).cast("double")).as("ylo"), max(col(yCol).cast("double")).as("yhi"))
    val banded = df.crossJoin(broadcast(bounds))
      .withColumn("bx", BandedRank.bandOf(col(xCol).cast("double"),
        col("xlo"), col("xhi"), bands))
      .withColumn("by", BandedRank.bandOf(col(yCol).cast("double"),
        col("ylo"), col("yhi"), bands))
      .drop("xlo", "xhi", "ylo", "yhi")
      .select(col(xCol).as("x"), col(yCol).as("y"), col(cCol).as("c"),
        col("bx"), col("by"))
      .cpLazy // consumed 5x (grid + 3 strip joins, both sides); lazy —
      // the first consumer is the broadcast-side grid aggregate, which
      // materializes it for the rest. Through the Ckpt seam (not a raw
      // localCheckpoint) so the window/cartesian lint sweeps the full
      // banded-join plan: this is a gate-path checkpoint, not an
      // operator-internal iterative one
    val par = spark.sparkContext.defaultParallelism

    // term 1: coarse grid dominance — G(a,b) · Σ_{a'<a, b'>b} G(a',b')
    val grid = banded.groupBy(col("bx"), col("by"))
      .agg(sum(col("c").cast(d19)).cast(d38).as("g"))
    val gridL = grid.select(col("bx").as("bx_i"), col("by").as("by_i"),
      col("g").as("g_i"))
    val t1 = grid.join(broadcast(gridL),
        col("bx_i") < col("bx") && col("by_i") > col("by"))
      .agg(coalesce(sum((col("g_i") * col("g")).cast(d38)), lit(0L).cast(d38))
        .as("t"))

    // strip terms: equi-join on the shared band key (shuffle-partitioned
    // by band — never a cartesian), strict inequalities as the filter
    def strip(eqKey: String, cond: Column): DataFrame = {
      val l = banded.repartition(par).select(col("x").as("x_i"),
        col("y").as("y_i"), col("c").as("c_i"),
        col("bx").as("bx_i"), col("by").as("by_i"))
      l.join(banded, col(s"${eqKey}_i") === col(eqKey) && cond)
        .agg(coalesce(sum((col("c_i").cast(d19) * col("c").cast(d19)).cast(d38)),
          lit(0L).cast(d38)).as("t"))
    }
    // 2: same y-band, earlier x-band, strictly larger y
    val t2 = strip("by", col("bx_i") < col("bx") && col("y_i") > col("y"))
    // 3: same x-band, later y-band, strictly smaller x
    val t3 = strip("bx", col("by_i") > col("by") && col("x_i") < col("x"))
    // 4: same cell, both strict
    val t4 = {
      val l = banded.repartition(par).select(col("x").as("x_i"),
        col("y").as("y_i"), col("c").as("c_i"),
        col("bx").as("bx_i"), col("by").as("by_i"))
      l.join(banded, col("bx_i") === col("bx") && col("by_i") === col("by")
          && col("x_i") < col("x") && col("y_i") > col("y"))
        .agg(coalesce(sum((col("c_i").cast(d19) * col("c").cast(d19)).cast(d38)),
          lit(0L).cast(d38)).as("t"))
    }
    t1.unionAll(t2).unionAll(t3).unionAll(t4)
      .agg(coalesce(sum(col("t")), lit(0L).cast(d38)).as("d"))
  }
}
