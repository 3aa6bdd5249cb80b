package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  *   1. bx< ∧ by>  — both coarse: counted on the DENSE B×B band GRID as
  *                   Σ G(cell)·H(cell), with the dominance sum H built by
  *                   TWO band-partitioned prefix windows (a per-xband
  *                   suffix over yband, then a per-yband prefix over
  *                   xband) — O(B²) rows total, ≤B rows per window
  *                   partition, NO row-level or cell-level pairs at all.
  *   2. bx< ∧ by=  — same y-band strip: row-level pairs ONLY within one
  *                   y-band, equi-joined on (band, salt) (never a
  *                   cartesian), inequality as join filter.
  *   3. bx= ∧ by>  — same x-band strip, symmetric.
  *   4. bx= ∧ by=  — same cell: pairs within one (bx, by) cell.
  *
  * Pair work drops from n²/2 to ≈ n²·(2/B + 1/B²)/2 row pairs plus the
  * O(B²) grid windows. SIZING (the r14 reducer-ceiling fix): `bands = 0`
  * auto-sizes B = max(16, ⌈√n⌉) from the same bounded one-row pass that
  * collects the value ranges — B = √n balances strip pair work (n²/B =
  * n^1.5) against the dense grid (B² = n rows), and the strip shuffle
  * then spreads over Θ(√n) band keys instead of a hard-coded 16. SKEW
  * (hot bands under non-uniform values): the strip join key is the
  * COMPOSITE (band, salt) — the probe side carries a deterministic
  * content salt in [0, S) and the build side is replicated S-fold
  * (S = defaultParallelism by default), so even a single hot band's pair
  * work fans out across S reducers at the bounded cost of S·n replicated
  * build rows. All counts accumulate in DECIMAL(38,0); ANSI-loud past
  * 10³⁸ pairs.
  */
object InversionCount {

  private val d19 = DecimalType(19, 0)
  private val d38 = DecimalType(38, 0)

  /** B for `bands = 0`: ⌈√n⌉ balances strip pair work (n²/B) against the
    * dense-grid window rows (B²); floor 16 keeps tiny frames banded. */
  private[graft] def autoBands(n: Long): Int =
    math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)

  /** One-row frame `d` = the exact discordant-pair count of `df`, a
    * collapsed (xCol, yCol, cCol) frame with DISTINCT (x, y) rows.
    * `bands = 0` → B = max(16, ⌈√n⌉); `salts = 0` → defaultParallelism. */
  def discordant(df: DataFrame, xCol: String, yCol: String, cCol: String,
      bands: Int = 0, salts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val zero = spark.range(1).select(lit(0L).cast(d38).as("d"))
    // bounds + size in ONE bounded pass (a 5-value single-row collect —
    // the Theil–Sen bounded-collect class): auto-sizing B needs n at PLAN
    // time, and inlining the collected bounds as literals replaces the
    // old broadcast-bounds cross join.
    val b = df.agg(
      min(col(xCol).cast("double")).as("xlo"), max(col(xCol).cast("double")).as("xhi"),
      min(col(yCol).cast("double")).as("ylo"), max(col(yCol).cast("double")).as("yhi"),
      count(lit(1)).as("n")).head()
    val n = b.getLong(4)
    if (n < 2 || b.isNullAt(0) || b.isNullAt(2)) return zero
    val bCount = if (bands > 0) bands else autoBands(n)
    val sCount = math.max(1,
      if (salts > 0) salts else spark.sparkContext.defaultParallelism)
    val banded = df
      .select(col(xCol).as("x"), col(yCol).as("y"), col(cCol).as("c"))
      .withColumn("xband", BandedRank.bandOf(col("x").cast("double"),
        lit(b.getDouble(0)), lit(b.getDouble(1)), bCount))
      .withColumn("yband", BandedRank.bandOf(col("y").cast("double"),
        lit(b.getDouble(2)), lit(b.getDouble(3)), bCount))
      .cpLazy // consumed 7x (grid + 3 strip joins, both sides); lazy —
      // the first consumer materializes it for the rest. Through the Ckpt
      // seam (not a raw localCheckpoint) so the window/cartesian lint
      // sweeps the full banded-join plan: this is a gate-path checkpoint,
      // not an operator-internal iterative one.

    // term 1: coarse grid dominance Σ G(a,b)·H(a,b) with
    // H(a,b) = Σ_{a'<a, b'>b} G(a',b'), on the DENSE grid so the two
    // prefix windows see every (a,b) cell: suf(a,b) = Σ_{b'>b} G(a,b')
    // per xband, then H = Σ_{a'<a} suf(a',b) per yband. The dense spine
    // is a bounded broadcast cross (B ≈ √n ⇒ B² ≈ n rows, ≤B per window
    // partition) — this replaces the r14 grid×grid broadcast join whose
    // comparison count grew as B⁴ and would have forbidden B ≫ 16.
    val grid = banded.groupBy(col("xband"), col("yband"))
      .agg(sum(col("c").cast(d19)).cast(d38).as("g"))
    val spine = spark.range(bCount).select(col("id").cast("int").as("xband"))
      .crossJoin(broadcast(
        spark.range(bCount).select(col("id").cast("int").as("yband"))))
    val wSuf = Window.partitionBy(col("xband")).orderBy(col("yband").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wPre = Window.partitionBy(col("yband")).orderBy(col("xband"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val t1 = spine.join(grid, Seq("xband", "yband"), "left")
      .select(col("xband"), col("yband"),
        coalesce(col("g"), lit(0L).cast(d38)).as("g"))
      .withColumn("suf", coalesce(sum(col("g")).over(wSuf), lit(0L).cast(d38)))
      .withColumn("h", coalesce(sum(col("suf")).over(wPre), lit(0L).cast(d38)))
      .agg(coalesce(sum((col("g") * col("h")).cast(d38)), lit(0L).cast(d38))
        .as("t"))

    // strip terms: equi-join on the composite (band, salt) key — the
    // probe side's salt is a deterministic content hash, the build side
    // replicates across all S salts, so each pair appears exactly once
    // and a hot band's pair work spreads over S reducers.
    val lhs = banded.select(col("x").as("x_i"), col("y").as("y_i"),
      col("c").as("c_i"), col("xband").as("xband_i"),
      col("yband").as("yband_i"),
      pmod(xxhash64(col("x"), col("y")), lit(sCount.toLong)).cast("int")
        .as("salt_i"))
    val rhs = banded.withColumn("salt",
      explode(sequence(lit(0), lit(sCount - 1))))
    def strip(eqKeys: Seq[String], cond: Column): DataFrame =
      lhs.join(rhs,
          (eqKeys.map(k => col(s"${k}_i") === col(k)) :+
            (col("salt_i") === col("salt"))).reduce(_ && _) && cond)
        .agg(coalesce(sum((col("c_i").cast(d19) * col("c").cast(d19)).cast(d38)),
          lit(0L).cast(d38)).as("t"))
    // 2: same y-band, earlier x-band, strictly larger y
    val t2 = strip(Seq("yband"),
      col("xband_i") < col("xband") && col("y_i") > col("y"))
    // 3: same x-band, later y-band, strictly smaller x
    val t3 = strip(Seq("xband"),
      col("yband_i") > col("yband") && col("x_i") < col("x"))
    // 4: same cell, both strict
    val t4 = strip(Seq("xband", "yband"),
      col("x_i") < col("x") && col("y_i") > col("y"))

    t1.unionAll(t2).unionAll(t3).unionAll(t4)
      .agg(coalesce(sum(col("t")), lit(0L).cast(d38)).as("d"))
  }
}
