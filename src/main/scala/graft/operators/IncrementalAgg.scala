package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — refresh a keyed aggregate table from
  * a delta batch without rescanning history (the n2kupdate "update the
  * reporting table" move, generalized to any sum/min/max-mergeable state).
  *
  * The state table holds PARTIAL aggregates: counts and decimal sums (exact,
  * order-independent — see OracleParity), min/max watermarks. A refresh is
  * `merge(state, partialOf(delta))`: union the two states and re-reduce per
  * key with each column's merge function. Cost is O(|delta| + |touched
  * keys|); the fact history is never read again. Derived values (averages,
  * rates) are computed at presentation time from the mergeable parts.
  *
  * 100 TB shape: ONE shuffle on the grouping key, sized by |delta keys| +
  * |state|; with the state table bucketed by key the union re-agg reuses
  * the state's partitioning and only the delta side shuffles. Because the
  * state is mergeable, refreshes compose associatively — hourly deltas can
  * roll into daily states and daily into the total, all with this same op.
  */
object IncrementalAgg {

  /** Column merge functions: how to reduce two partial states per key.
    * "sum" for counts/decimal sums, "min"/"max" for watermarks. */
  type MergeSpec = Seq[(String, String)]

  def merge(state: DataFrame, delta: DataFrame, keys: Seq[String],
            spec: MergeSpec): DataFrame = {
    require(spec.nonEmpty, "merge spec must name at least one state column")
    val aggs = spec.map {
      case (c, "sum") => sum(col(c)).as(c)
      case (c, "min") => min(col(c)).as(c)
      case (c, "max") => max(col(c)).as(c)
      case (c, fn)    => throw new IllegalArgumentException(s"$c: unknown merge fn $fn")
    }
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Join-based refresh for BUCKETED state tables: `merge`'s union+groupBy
    * re-shuffles the state too, but a full-outer join keyed on the
    * bucketing columns lets a bucketed state side skip its Exchange
    * entirely — only the (small) delta shuffles. Same result as `merge`
    * (spec-pinned); per-column combine is null-safe: a key present on one
    * side keeps that side's partial unchanged. */
  def mergeOuter(state: DataFrame, delta: DataFrame, keys: Seq[String],
                 spec: MergeSpec): DataFrame = {
    require(spec.nonEmpty, "merge spec must name at least one state column")
    def ren(df: DataFrame, suf: String) =
      spec.foldLeft(df) { case (d, (c, _)) => d.withColumnRenamed(c, c + suf) }
    ren(state, "__s").join(ren(delta, "__d"), keys, "full_outer")
      .select(keys.map(col) ++ spec.map { case (c, fn) =>
        val (a, b) = (col(c + "__s"), col(c + "__d"))
        (fn match {
          case "sum" => coalesce(a + b, a, b) // a+b is null iff a side is absent
          case "min" => least(a, b)           // least/greatest skip nulls
          case "max" => greatest(a, b)
          case other => throw new IllegalArgumentException(s"$c: unknown merge fn $other")
        }).as(c)
      }: _*)
  }
}
