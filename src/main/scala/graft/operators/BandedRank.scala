package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed per-group rank / prefix-sum via VALUE BANDING — the
  * q_pareto/q_gini machinery (Relational7.qPareto) factored out so the
  * per-group rank statistics (q_spearman, q_mann_whitney, q_ks_test) ride
  * it too, instead of sorting a whole group through one reducer.
  *
  * The problem class (VERDICT r12 "What's wrong" #1): a window
  * `PARTITION BY group ORDER BY value` over a fact table with few groups
  * pushes a corpus-sized sort through |groups| tasks — the one
  * scale-killer shape left in the repo. The fix: band each group's value
  * range into `bands` equal-width slices (a pure, MONOTONE function of
  * value, so ties always share a band and band-then-value order equals
  * global in-group value order), aggregate per-(group, band) subtotals
  * into a ≤|groups|·bands-row frame, prefix THAT tiny frame for
  * cross-band offsets, and run the within-band window PARTITIONED BY
  * (group, band) — `bands`× more reducers, each sorting only its slice.
  * `bands` is the scale knob: 16 matches qPareto at bench scale; a
  * 100 TB deployment raises it until a band's slice fits one task.
  *
  * Results are VALUE-IDENTICAL to the flat single-partition window (the
  * DuckDB oracles keep their flat form — that is the cross-check that the
  * decomposition is exact). Banding casts the value to double INTERNALLY
  * (monotone, ties preserved as ties — distinct values may collide into
  * one band, which is harmless); ordering within a band always uses the
  * ORIGINAL column, so exact types keep exact order.
  *
  * CACHING CONTRACT: these helpers consume the input 2-4 times (bounds,
  * band subtotals, the final banded join) and add NO checkpoint of their
  * own — the caller localCheckpoints the input if its lineage is
  * expensive (all three gate callers do). Keeping the checkpoint at the
  * call site avoids double-materialization when the caller already holds
  * a checkpointed frame.
  */
object BandedRank {

  val DefaultBands = 16

  /** Equal-width band of `v` within [lo, hi], clamped to [0, bands-1].
    * Weakly monotone in v (IEEE subtract/divide/floor preserve order),
    * equal values get equal bands; degenerate hi==lo maps all to band 0. */
  private[graft] def bandOf(v: Column, lo: Column, hi: Column, bands: Int): Column =
    when(hi > lo,
      least(greatest(floor((v - lo) / ((hi - lo) / lit(bands.toDouble))), lit(0.0)),
        lit((bands - 1).toDouble)))
      .otherwise(lit(0.0)).cast("int")

  /** Adds one output column per (valueCol -> out) pair: the global
    * MIN-RANK (SQL RANK()) of that value within each `groupCols`
    * partition, computed as cross-band row-count offset + within-band
    * rank. Ties receive the shared min-rank, exactly like the flat
    * `RANK() OVER (PARTITION BY group ORDER BY value)`. Multiple value
    * columns share one bounds pass and one banded frame (q_spearman
    * ranks x and y in a single call). */
  def withMinRanks(df: DataFrame, groupCols: Seq[String],
      ranks: Seq[(String, String)], bands: Int = DefaultBands): DataFrame = {
    val g = groupCols.map(col)
    val boundAggs = ranks.flatMap { case (v, out) =>
      val vd = col(v).cast("double")
      Seq(min(vd).as(s"__lo_$out"), max(vd).as(s"__hi_$out"))
    }
    val bounds = df.groupBy(g: _*).agg(boundAggs.head, boundAggs.tail: _*)
    val banded = ranks.foldLeft(df.join(broadcast(bounds), groupCols)) {
      case (d, (v, out)) =>
        d.withColumn(s"__band_$out",
          bandOf(col(v).cast("double"), col(s"__lo_$out"), col(s"__hi_$out"), bands))
          .drop(s"__lo_$out", s"__hi_$out")
    }
    ranks.foldLeft(banded) { case (d, (v, out)) =>
      val bandCnt = banded.groupBy((g :+ col(s"__band_$out")): _*)
        .agg(count(lit(1)).as("__bn"))
      val wOff = Window.partitionBy(g: _*).orderBy(col(s"__band_$out"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = bandCnt
        .withColumn(s"__off_$out", coalesce(sum(col("__bn")).over(wOff), lit(0L)))
        .drop("__bn")
      val wIn = Window.partitionBy((g :+ col(s"__band_$out")): _*)
        .orderBy(col(v))
      d.join(broadcast(offsets), groupCols :+ s"__band_$out")
        .withColumn(out, col(s"__off_$out") + rank().over(wIn).cast("long"))
        .drop(s"__band_$out", s"__off_$out")
    }
  }

  /** Adds, per (in, out) weight pair, `out` = the INCLUSIVE prefix sum of
    * `in` over `valueCol` order within each `groupCols` partition —
    * `SUM(in) OVER (PARTITION BY group ORDER BY value ROWS UNBOUNDED
    * PRECEDING)` — as cross-band subtotal offset + within-band running sum.
    *
    * PRECONDITION: `valueCol` is DISTINCT within each group (the callers
    * collapse to per-(group, value) counts first), so the ROWS frame is
    * deterministic — with ties an inclusive ROWS sum would be
    * partition-order-dependent. */
  def withPrefixSums(df: DataFrame, groupCols: Seq[String], valueCol: String,
      weights: Seq[(String, String)], bands: Int = DefaultBands): DataFrame = {
    val g = groupCols.map(col)
    val vd = col(valueCol).cast("double")
    val bounds = df.groupBy(g: _*).agg(min(vd).as("__lo"), max(vd).as("__hi"))
    val banded = df.join(broadcast(bounds), groupCols)
      .withColumn("__band", bandOf(vd, col("__lo"), col("__hi"), bands))
      .drop("__lo", "__hi")
    val wsums = weights.map { case (in, out) => sum(col(in)).as(s"__b_$out") }
    val bandAgg = banded.groupBy((g :+ col("__band")): _*)
      .agg(wsums.head, wsums.tail: _*)
    val wOff = Window.partitionBy(g: _*).orderBy(col("__band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = weights.foldLeft(bandAgg) { case (d, (_, out)) =>
      d.withColumn(s"__off_$out",
        coalesce(sum(col(s"__b_$out")).over(wOff), lit(0L)))
    }.select((g :+ col("__band")) ++
      weights.map { case (_, out) => col(s"__off_$out") }: _*)
    val wIn = Window.partitionBy((g :+ col("__band")): _*)
      .orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = banded.join(broadcast(offsets), groupCols :+ "__band")
    weights.foldLeft(joined) { case (d, (in, out)) =>
      d.withColumn(out, col(s"__off_$out") + sum(col(in)).over(wIn))
        .drop(s"__off_$out")
    }.drop("__band")
  }
}
