package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic contracts of q_sketch_quantile (queries/Relational12.scala):
  *
  *   1. BOUND — the interpolated estimate and the exact rank-r element
  *      live in the same bucket by construction, so |est − exact| ≤ w
  *      on EVERY input (the gate's emitted `within_bound` proof).
  *   2. MERGEABILITY — the whole point of the store: answering from
  *      per-day sketches merged at query time equals answering from one
  *      global sketch of the same rows, for ANY slicing of rows into
  *      days (bucket counts add; nothing else is slice-dependent).
  *   3. DETERMINISM — the answer chain is exact integers + one pinned
  *      double chain, so it is bitwise partition-layout-invariant.
  *   4. STORE ROUNDTRIP — the physical parquet store is content-lossless
  *      (same answers with and without the write/read hop).
  */
class SketchQuantileSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def v(i: Int, m: Int): Long = ((i * 2654435761L) >>> 7) % m

  /** (type, day, x6) planted frame: three types, values spread over a
    * wide range with heavy low-end skew (the shape fixed-width bins are
    * WORST at — the bound must still hold). */
  private def frame(n: Int, days: Int): DataFrame =
    (0 until n).map { i =>
      val x = (v(i, 1000) + 1L) * (v(i + 3, 97) + 1L) * 1000L // skewed
      (s"t${i % 3}", v(i + 11, days).toLong, x)
    }.toDF("event_type", "day", "x6")

  private def run(df: DataFrame, store: Option[String] = None): Seq[Row] =
    graft.queries.Relational12.sketchQuantile(df, store)
      .collect().toSeq

  test("bound: |est - exact| <= bucket width on every row; within_bound emitted true") {
    val rows = run(frame(3000, 7))
    assert(rows.size == 9) // 3 types x 3 percentiles
    rows.foreach { r =>
      val (w, err, ok) = (r.getDouble(4), r.getDouble(7), r.getBoolean(8))
      assert(err <= w, s"${r.getString(0)} p${r.getInt(1)}: err=$err > w=$w")
      assert(ok)
    }
  }

  test("mergeability: any day slicing answers identically to one global slice") {
    val base = frame(2000, 1).drop("day")
    // three slicings of the SAME rows: 1 day, 5 days, 97 days
    val answers = Seq(1, 5, 97).map { d =>
      val sliced = base.withColumn("day",
        pmod(xxhash64(col("x6"), monotonically_increasing_id()), lit(d)))
      run(sliced.select(col("event_type"), col("day"), col("x6")))
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
          java.lang.Double.doubleToRawLongBits(r.getDouble(5))))
    }
    assert(answers(0) == answers(1) && answers(1) == answers(2),
      "merged per-day sketches must answer exactly like the global sketch")
  }

  test("determinism: bitwise identical across partition layouts") {
    val f = frame(1500, 11)
    def bits(rows: Seq[Row]): Seq[Seq[Long]] = rows.map(r =>
      Seq(5, 6, 7).map(j => java.lang.Double.doubleToRawLongBits(r.getDouble(j))))
    assert(bits(run(f.repartition(1))) == bits(run(f.repartition(13))))
  }

  test("store roundtrip: the parquet hop is content-lossless") {
    val f = frame(1200, 5)
    val out = java.nio.file.Files.createTempDirectory("qsketch_spec").toString
    val direct = run(f).map(_.toString)
    val viaStore = run(f, Some(out)).map(_.toString)
    assert(direct == viaStore)
    // and the store really is per-slice: one directory per day
    val dirs = new java.io.File(out).listFiles()
      .count(d => d.isDirectory && d.getName.startsWith("day="))
    assert(dirs == 5, s"expected 5 day= slice dirs, found $dirs")
  }

  test("incremental append: slice-at-a-time ingest equals the batch store; re-ingest idempotent") {
    val f = frame(2000, 5)
    // the pinned bin layout — at 100 TB a metric contract, here the
    // frame's own bounds so batch and incremental share it exactly
    val Row(lo: Long, hi: Long) = f.agg(min(col("x6")), max(col("x6"))).head()
    val w = (hi - lo) / graft.queries.Relational12.QSketchBuckets + 1
    val store = java.nio.file.Files.createTempDirectory("qsketch_inc").toString
    (0 until 5).foreach { d =>
      graft.queries.Relational12.appendSliceSketch(
        f.filter(col("day") === d), store, lo, w)
    }
    val batch = graft.queries.Relational12.sliceSketch(
      f.withColumn("lo", lit(lo)).withColumn("w", lit(w)))
    def rows(df: DataFrame): Seq[String] =
      df.select(col("event_type"), col("day").cast("long"), col("bucket"),
        col("cnt"), col("lo"), col("w")).collect().map(_.toString).sorted.toSeq
    assert(rows(spark.read.parquet(store)) == rows(batch),
      "five appends must reconstruct the batch store exactly")
    // late re-ingest of one day: dynamic partition overwrite is idempotent
    graft.queries.Relational12.appendSliceSketch(
      f.filter(col("day") === 2), store, lo, w)
    assert(rows(spark.read.parquet(store)) == rows(batch),
      "re-appending a day must replace, not duplicate, its partition")
  }

  test("single-value type: all percentiles collapse to the value, err 0") {
    val f = (0 until 50).map(i => ("only", (i % 3).toLong, 7000000L))
      .toDF("event_type", "day", "x6")
    run(f).foreach { r =>
      assert(r.getDouble(6) == 7.0, "exact")
      assert(r.getDouble(7) <= r.getDouble(4), "err within one bucket")
      assert(r.getBoolean(8))
    }
  }
}
