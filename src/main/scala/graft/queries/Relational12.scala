package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-15 analytics batch: the mergeable-sketch STORE family's quantile
  * member (VERDICT r14 "Next round" #8 — the per-partition
  * rollup-and-store pattern q_sketch_setops proved for KMV distinct
  * counts, applied to percentiles).
  */
object Relational12 {

  private val UsPerDay = 86400000000L

  /** Sketch resolution: 128 equal-width integer buckets. The relative
    * error bound is ONE bucket width = range/128; raise B for tighter
    * answers — state per stored slice stays O(B). */
  val QSketchBuckets = 128

  // ----------------------------------------------------- q_sketch_quantile

  /** q_sketch_quantile: MERGEABLE QUANTILE SKETCHES, stored per slice and
    * merged at query time — the percentile analogue of q_sketch_setops'
    * KMV store: each DAY's ingest rolls its events into an O(B)-row
    * fixed-bin count sketch (bucket = (x6 − lo) div w, all integer
    * arithmetic — deterministic and hash-checkable, unlike a
    * coin-flipping KLL compactor), the sketches are WRITTEN to the store
    * and read back, and p50/p90/p99 per event type are answered from the
    * MERGED sketch alone — counts add across any slicing, so a year's
    * percentile is |days|·B sketch rows, never a re-scan of the year.
    * This is the piece that makes q_rfm / t_curriculum / q_histogram_eqd's
    * approx toggles INCREMENTAL at 100 TB: the per-day rollup is the only
    * pass that ever touches the fact.
    *
    * Estimate = linear interpolation of rank r = ⌈p·n/100⌉ inside its
    * bucket — ONE pinned double chain over exact integers (lo, bucket·w,
    * r − cum_before, cnt are all BIGINTs; the q_bollinger rule). Beside
    * it the gate emits the EXACT percentile_disc of the same rank and the
    * guaranteed bound: the rank-r element lives in the selected bucket by
    * construction, so |est − exact| ≤ w ALWAYS — `within_bound` is the
    * emitted proof, and SketchQuantileSpec asserts it on planted frames.
    *
    * Bin layout: [lo, hi] from one bounds pass over the current corpus
    * (deterministic; the oracle mirrors it). A production store pins the
    * layout per metric contract up front instead, so late slices can't
    * shift old bins — the merge/answer path is identical either way.
    *
    * Scale shape: ONE map-side-partial (type, day, bucket) rollup over
    * the fact (the stored sketch — bounded by |types|·|days|·B at ANY
    * corpus scale), a bucket-keyed merge, and ≤B-row per-type windows
    * (bucket-ordered — the BandedRank-bounded class). The exact
    * percentile columns are the oracle's cross-check and would be DROPPED
    * at 100 TB — the sketch path never sorts the fact. */
  def qSketchQuantile(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        expr(s"(ts div 1000) div $UsPerDay").as("day"),
        (col("value").cast("decimal(18,6)") * lit(1000000L))
          .cast("long").as("x6"))
    val out = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
      s"/tmp/graft_qsketch_store_$h"
    }
    sketchQuantile(ev, Some(out))
  }

  /** The sketch-store-merge-answer core over any (event_type, day,
    * x6 BIGINT) frame — factored out so SketchQuantileSpec plants frames
    * with chosen slicings; `store = None` skips the physical roundtrip
    * (the spec's merge-algebra tests), `Some(path)` writes/reads the
    * per-day sketch parquet exactly as the gate does. */
  private[graft] def sketchQuantile(ev: DataFrame,
      store: Option[String]): DataFrame = {
    val s = ev.sparkSession
    val b = QSketchBuckets
    val bounds = ev.agg(min(col("x6")).as("lo"), max(col("x6")).as("hi"))
    // the per-slice sketch: O(B) rows per (type, day), all-integer
    val sketch = ev.crossJoin(broadcast(bounds))
      .withColumn("w", expr(s"(hi - lo) div $b + 1"))
      .withColumn("bucket", expr("(x6 - lo) div w"))
      .groupBy(col("event_type"), col("day"), col("bucket"))
      .agg(count(lit(1)).as("cnt"), max(col("lo")).as("lo"), max(col("w")).as("w"))
    // STORE: the rollup a pipeline persists per ingest slice —
    // day-clustered first so each slice directory is ONE file (without
    // it every shuffle partition writes a sliver into every day)...
    val stored = store match {
      case Some(out) =>
        sketch.repartition(col("day"))
          .write.mode("overwrite").partitionBy("day").parquet(out)
        s.read.parquet(out)
      case None => sketch
    }
    // ...and the MERGE+ANSWER path, reading ONLY the store
    val merged = stored
      .groupBy(col("event_type"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"), max(col("lo")).as("lo"), max(col("w")).as("w"))
    val tot = merged.groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("n"), count(lit(1)).as("n_buckets"))
    val cum = merged.withColumn("cum",
      sum(col("cnt")).over(Window.partitionBy(col("event_type"))
        .orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ps = s.range(1).select(
      explode(array(lit(50), lit(90), lit(99))).as("p"))
    // exact cross-check (dropped at scale — the sketch path never sorts)
    val exact = ev.groupBy(col("event_type")).agg(
      expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY x6)").as("e50"),
      expr("percentile_disc(0.90) WITHIN GROUP (ORDER BY x6)").as("e90"),
      expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY x6)").as("e99"))
    val r = expr("(p * n + 99) div 100") // = ceil(p·n/100), exact
    val sel = cum.join(broadcast(tot), "event_type")
      .crossJoin(broadcast(ps))
      .withColumn("r", r)
      .filter(col("cum") - col("cnt") < col("r") && col("r") <= col("cum"))
    val estX6 = (col("lo") + col("bucket") * col("w")).cast("double") +
      (col("r") - (col("cum") - col("cnt"))).cast("double") /
        col("cnt").cast("double") * col("w").cast("double")
    val est = estX6 / lit(1000000.0)
    val exactX6 = when(col("p") === 50, col("e50"))
      .when(col("p") === 90, col("e90")).otherwise(col("e99"))
    val exactV = exactX6.cast("double") / lit(1000000.0)
    val widthV = col("w").cast("double") / lit(1000000.0)
    // the bound is asserted in MICRO space, where it holds EXACTLY in
    // doubles (estX6 and exactX6 are both ≤2^53 integers-or-bounded
    // interpolants inside the same bucket, so |diff| ≤ w with no rounding
    // slack); dividing est and exact by 1e6 separately first can push the
    // value-space difference one ulp past the value-space width —
    // SketchQuantileSpec's single-value case caught exactly that.
    val errX6 = abs(estX6 - exactX6.cast("double"))
    sel.join(broadcast(exact), "event_type")
      .select(col("event_type"), col("p"), col("n"), col("n_buckets"),
        widthV.as("width_value"), est.as("est_value"),
        exactV.as("exact_value"),
        (errX6 / lit(1000000.0)).as("abs_err"),
        (errX6 <= col("w").cast("double")).as("within_bound"))
      .orderBy(col("event_type"), col("p"))
  }

  val qSketchQuantileSql: String = {
    val b = QSketchBuckets
    s"""WITH ev AS (
       |  SELECT event_type, epoch_us(ts) // $UsPerDay AS day,
       |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS x6
       |  FROM events WHERE value IS NOT NULL),
       |bd AS (SELECT MIN(x6) AS lo, (MAX(x6) - MIN(x6)) // $b + 1 AS w FROM ev),
       |sk AS (
       |  SELECT event_type, day, (x6 - lo) // w AS bucket,
       |    CAST(COUNT(*) AS BIGINT) AS cnt, MAX(lo) AS lo, MAX(w) AS w
       |  FROM ev, bd GROUP BY 1, 2, 3),
       |m AS (
       |  SELECT event_type, bucket, CAST(SUM(cnt) AS BIGINT) AS cnt,
       |    MAX(lo) AS lo, MAX(w) AS w
       |  FROM sk GROUP BY 1, 2),
       |t AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n,
       |        CAST(COUNT(*) AS BIGINT) AS n_buckets FROM m GROUP BY 1),
       |c AS (
       |  SELECT event_type, bucket, cnt, lo, w,
       |    CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM m),
       |x AS (
       |  SELECT event_type,
       |    quantile_disc(x6, 0.50) AS e50, quantile_disc(x6, 0.90) AS e90,
       |    quantile_disc(x6, 0.99) AS e99
       |  FROM ev GROUP BY 1),
       |p(p) AS (VALUES (50), (90), (99)),
       |sel AS (
       |  SELECT c.event_type, p.p, t.n, t.n_buckets, c.bucket, c.cnt, c.lo, c.w,
       |    c.cum - c.cnt AS cum_before, (p.p * t.n + 99) // 100 AS r
       |  FROM c JOIN t ON c.event_type = t.event_type CROSS JOIN p
       |  WHERE c.cum - c.cnt < (p.p * t.n + 99) // 100
       |    AND (p.p * t.n + 99) // 100 <= c.cum),
       |f AS (
       |  SELECT s.event_type, s.p, s.n, s.n_buckets, s.w,
       |    CAST(s.lo + s.bucket * s.w AS DOUBLE)
       |      + CAST(s.r - s.cum_before AS DOUBLE) / CAST(s.cnt AS DOUBLE)
       |        * CAST(s.w AS DOUBLE) AS est_x6,
       |    CAST(CASE WHEN s.p = 50 THEN x.e50
       |              WHEN s.p = 90 THEN x.e90 ELSE x.e99 END AS DOUBLE) AS exact_x6
       |  FROM sel s JOIN x ON s.event_type = x.event_type)
       |SELECT event_type, p, n, n_buckets,
       |  CAST(w AS DOUBLE) / 1000000.0 AS width_value,
       |  est_x6 / 1000000.0 AS est_value,
       |  exact_x6 / 1000000.0 AS exact_value,
       |  -- bound in MICRO space, where |diff| <= w holds exactly in doubles
       |  abs(est_x6 - exact_x6) / 1000000.0 AS abs_err,
       |  abs(est_x6 - exact_x6) <= CAST(w AS DOUBLE) AS within_bound
       |FROM f ORDER BY event_type, p""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sketch_quantile" -> (qSketchQuantile _))

  val oracle: Map[String, String] = Map(
    "q_sketch_quantile" -> qSketchQuantileSql)
}
