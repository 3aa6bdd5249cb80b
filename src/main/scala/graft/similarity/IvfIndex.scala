package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Persisted IVF index — the 100 TB ANN shape: the expensive parts
  * (centroid training, corpus bucket assignment) run ONCE at build time and
  * land on disk partitioned by bucket; every subsequent query probes only
  * its `nprobe` buckets, and because the probed bucket ids are known before
  * the scan (|Q|·nprobe ints collected from the centroid comparison — a
  * driver-side list the size of the query set, never the corpus), they push
  * into the read as a STATIC partition filter. The scan physically reads
  * nprobe/C of the corpus — partition pruning is the disk-level analogue of
  * the inverted file.
  *
  * Centroid count defaults to C ≈ √N (the classical IVF balance point:
  * per-query work C + k·N/C minimizes at C = √(kN), and probe cost grows
  * with C), so the index keeps its shape as the corpus scales.
  */
object IvfIndex {

  /** Train centroids and persist the bucket-partitioned corpus layout.
    * Build once; probe many.
    * @param pretrained reuse an already-trained centroid frame
    *        (c_id, c_vec) instead of fitting — how a rebuild reuses the
    *        previous model, or several index variants share one training. */
  def build(spark: SparkSession, corpus: DataFrame, idCol: String, vecCol: String,
      path: String, numCentroids: Option[Int] = None, iters: Int = 2,
      pretrained: Option[DataFrame] = None): Unit = {
    VectorExpressions.register(spark)
    val centroids = pretrained.getOrElse {
      val c = numCentroids.getOrElse {
        // footer metadata when the corpus is a bare file scan, count()
        // otherwise (RowCountEstimate guards the plan shape — a filtered
        // or joined corpus must never size C from its files' row counts)
        val n = graft.sources.RowCountEstimate.estimate(corpus)
        math.max(2, math.round(math.sqrt(n.toDouble)).toInt)
      }
      Kmeans.fit(spark, corpus, idCol, vecCol, c, iters)
    }
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
    Knn.assignBuckets(spark, corpus, centroids, idCol, vecCol)
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/buckets")
  }

  /** Append new vectors to a built index WITHOUT retraining: assign against
    * the persisted centroids and land them in the bucket-partitioned layout
    * — ingestion stays O(|new|) while probes keep pruning. Ids already in
    * the index are skipped (anti-join on the column-pruned id read), so a
    * re-submitted batch cannot duplicate vectors.
    *
    * Crash-safe rename commit: the batch is first written (with its own
    * job-level commit + _SUCCESS) to a staging subdir, and only then are
    * the finished files MOVED into `buckets/` — a per-file atomic rename,
    * so the live layout never holds a torn file. A death mid-move leaves
    * some complete files placed and the rest in staging; rerunning the
    * same append clears the stale staging dir, anti-joins away the ids
    * that made it in, and lands the remainder — converging with neither
    * duplicates nor holes (IvfIndexSpec simulates exactly this).
    * Centroids drift as the corpus distribution shifts; rebuild when bucket
    * imbalance or the recall SLO degrades (the classic IVF contract). */
  def append(spark: SparkSession, path: String, newCorpus: DataFrame,
      idCol: String, vecCol: String): Unit = {
    VectorExpressions.register(spark)
    import org.apache.hadoop.fs.Path
    val staging = new Path(s"$path/_staging_append")
    val fs = staging.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(staging, true) // clear any crashed prior attempt's leftovers
    val centroids = spark.read.parquet(s"$path/centroids")
    val existing = spark.read.parquet(s"$path/buckets")
      .select(col("n_id").as(idCol))
    val fresh = newCorpus.join(existing, Seq(idCol), "left_anti")
    Knn.assignBuckets(spark, fresh, centroids, idCol, vecCol)
      .write.mode("overwrite").partitionBy("bucket").parquet(staging.toString)
    commitStaged(fs, staging, new Path(s"$path/buckets"))
  }

  /** Move every staged bucket file into the live layout. File names carry
    * the writing job's UUID, so renames cannot collide with resident files;
    * each rename is atomic at the filesystem level. */
  private def commitStaged(fs: org.apache.hadoop.fs.FileSystem,
      staging: org.apache.hadoop.fs.Path, live: org.apache.hadoop.fs.Path): Unit = {
    for (b <- fs.listStatus(staging) if b.isDirectory && b.getPath.getName.startsWith("bucket=")) {
      val dest = new org.apache.hadoop.fs.Path(live, b.getPath.getName)
      fs.mkdirs(dest)
      for (f <- fs.listStatus(b.getPath) if f.getPath.getName.startsWith("part-")) {
        val to = new org.apache.hadoop.fs.Path(dest, f.getPath.getName)
        require(fs.rename(f.getPath, to), s"rename ${f.getPath} -> $to failed")
      }
    }
    fs.delete(staging, true)
  }

  /** Bucket-occupancy report of a built index: (bucket, n, share) — the
    * s_ivf_stats imbalance signal read from the persisted layout. One
    * aggregation over the column-pruned bucket scan; |C| output rows. */
  def stats(spark: SparkSession, path: String): DataFrame = {
    val counts = spark.read.parquet(s"$path/buckets")
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    counts.crossJoin(broadcast(counts.agg(sum(col("n")).as("total"))))
      .select(col("bucket"), col("n"),
        (col("n").cast("double") / col("total").cast("double")).as("share"))
  }

  /** The maintenance operator a pipeline schedules against the stats()
    * signal: when any bucket holds more than `maxShare` of the corpus,
    * SPLIT each overloaded cell — a `splitFactor`-way Lloyd retrain on
    * that cell's own members — and rewrite ONLY those buckets' files plus
    * the |C|-row centroid table. Untouched cells keep their files and
    * their centroids: the rebuild cost is proportional to the overloaded
    * mass, not the corpus (the append path's staged-rename commit,
    * reused). Probes see a coherent index throughout their usual
    * contract: every vector sits in exactly one cell of the updated
    * centroid table, and queries that rank the updated centroids probe
    * the new sub-cells exactly like any others.
    *
    * Crash safety: NO data file is deleted before its replacement is
    * live. The swap order is (1) staged sub-cell files move into
    * `buckets/` (fresh cell ids — no collision, and unreachable behind
    * the old centroid table, so probes are unaffected), (2) the updated
    * centroid table publishes by staged-write + rename swap, (3) only
    * then do the superseded bucket directories delete. Re-running after
    * a crash first calls repairLayout, which finishes or rolls back a
    * half-done centroid swap and drops bucket directories the centroid
    * table no longer references — every crash point leaves a
    * recoverable index (IvfIndexSpec exercises the windows).
    *
    * @return true if a rebuild fired (some bucket exceeded maxShare) */
  def rebuildIfImbalanced(spark: SparkSession, path: String,
      maxShare: Double = 0.25, splitFactor: Int = 2, iters: Int = 2): Boolean = {
    VectorExpressions.register(spark)
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    repairLayout(spark, fs, path)
    val overloaded = stats(spark, path).filter(col("share") > maxShare)
      .select(col("bucket")).collect().map(_.getAs[Number](0).longValue).sorted
    if (overloaded.isEmpty) return false
    val staging = new Path(s"$path/_staging_rebuild")
    fs.delete(staging, true) // clear any crashed prior attempt's leftovers
    val centroids = spark.read.parquet(s"$path/centroids")
    var nextId = centroids.agg(max(col("c_id"))).head().getLong(0) + 1
    val newCells = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (b <- overloaded) {
      val members = spark.read.parquet(s"$path/buckets")
        .filter(col("bucket") === b).select(col("n_id"), col("n_vec"))
      // sub-cell centroids trained on the cell's members only, relabeled
      // past the existing id space so cell ids never collide
      val sub = Kmeans.fit(spark, members, "n_id", "n_vec", splitFactor, iters)
      val relabeled = sub
        .withColumn("rn", row_number().over(Window.orderBy(col("c_id"))))
        .select((col("rn").cast("long") + lit(nextId - 1)).as("c_id"), col("c_vec"))
        .localCheckpoint()
      nextId += splitFactor
      newCells += relabeled
      Knn.assignBuckets(spark, members, relabeled, "n_id", "n_vec")
        .write.mode("append").partitionBy("bucket").parquet(staging.toString)
    }
    // swap — replacements land before anything deletes (see Scaladoc)
    commitStaged(fs, staging, new Path(s"$path/buckets"))
    val updated = (Seq(centroids.filter(
        !col("c_id").isin(overloaded.map(x => x: Any): _*))) ++ newCells)
      .reduce(_ unionByName _).localCheckpoint() // materialize before the rename below moves its input
    val liveC = new Path(s"$path/centroids")
    val stagedC = new Path(s"$path/_staging_centroids")
    val retiredC = new Path(s"$path/_retired_centroids")
    fs.delete(stagedC, true); fs.delete(retiredC, true)
    updated.write.mode("overwrite").parquet(stagedC.toString)
    require(fs.rename(liveC, retiredC), s"rename $liveC -> $retiredC failed")
    require(fs.rename(stagedC, liveC), s"rename $stagedC -> $liveC failed")
    // only now retire the split cells' superseded files
    for (b <- overloaded) fs.delete(new Path(s"$path/buckets/bucket=$b"), true)
    fs.delete(retiredC, true)
    true
  }

  /** Bring a possibly-crashed layout back to a coherent state: finish a
    * centroid swap whose staged table committed (its _SUCCESS exists),
    * roll back to the retired table otherwise, then drop bucket
    * directories the centroid table does not reference (sub-cells whose
    * swap never published, or half-moved staging leftovers) — their
    * vectors still live in the not-yet-deleted original buckets, so
    * dropping the orphans loses no data and keeps a later rebuild's
    * fresh cell ids collision-free. Idempotent; a no-op on a healthy
    * index. */
  private def repairLayout(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val liveC = new Path(s"$path/centroids")
    val stagedC = new Path(s"$path/_staging_centroids")
    val retiredC = new Path(s"$path/_retired_centroids")
    if (!fs.exists(liveC)) {
      if (fs.exists(new Path(stagedC, "_SUCCESS")))
        require(fs.rename(stagedC, liveC), s"repair rename $stagedC -> $liveC failed")
      else if (fs.exists(retiredC))
        require(fs.rename(retiredC, liveC), s"repair rename $retiredC -> $liveC failed")
      else throw new IllegalStateException(s"no centroid table at $path")
    }
    fs.delete(stagedC, true); fs.delete(retiredC, true)
    val bucketsDir = new Path(s"$path/buckets")
    if (fs.exists(bucketsDir)) {
      val known = spark.read.parquet(liveC.toString)
        .select(col("c_id")).collect().map(_.getAs[Number](0).longValue).toSet
      for (d <- fs.listStatus(bucketsDir)
           if d.isDirectory && d.getPath.getName.startsWith("bucket=");
           id <- scala.util.Try(d.getPath.getName.stripPrefix("bucket=").toLong).toOption
           if !known.contains(id))
        fs.delete(d.getPath, true)
    }
  }

  /** Auto-tune nprobe against a recall SLO — the maintenance operator
    * that CONSUMES the s_recall observability signal (as
    * rebuildIfImbalanced consumes s_ivf_stats): probe a sampled query
    * panel at doubling nprobe until recall@k against the exact
    * brute-force truth on the SAME panel meets `target`, or nprobe
    * reaches the centroid count (exhaustive probing ≡ brute force, so
    * the loop always terminates with the best the index can do).
    * Cost: one brute pass over the bounded panel (k·|Q| truth rows,
    * checkpointed) + at most ⌈log₂ C⌉ probes — this runs over a sampled
    * panel on a schedule, never the live query stream.
    * @return (chosen nprobe, its measured recall@k) */
  def tuneNprobe(spark: SparkSession, path: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, target: Double): (Int, Double) = {
    VectorExpressions.register(spark)
    val corpus = spark.read.parquet(s"$path/buckets")
      .select(col("n_id").as(idCol), col("n_vec").as(vecCol))
    val truth = Knn.bruteForce(spark, corpus, queries, idCol, vecCol, k)
      .select(col("q_id"), col("n_id")).localCheckpoint()
    val total = truth.count().toDouble
    require(total > 0, "empty truth panel — no queries or empty index")
    val cMax = spark.read.parquet(s"$path/centroids").count().toInt
    var np = 1
    var recall = 0.0
    while ({
      val ann = probe(spark, path, queries, idCol, vecCol, k, np)
        .select(col("q_id"), col("n_id"), lit(1).as("hit"))
      recall = truth.join(ann, Seq("q_id", "n_id"), "left")
        .filter(col("hit").isNotNull).count() / total
      recall < target && np < cMax
    }) np = math.min(np * 2, cMax)
    (np, recall)
  }

  /** ANN top-k against a built index. Queries need (idCol, vecCol). */
  def probe(spark: SparkSession, path: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    VectorExpressions.register(spark)
    val centroids = spark.read.parquet(s"$path/centroids")
    // nprobe nearest centroids per query — the window sees |Q|·C rows only
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("c_cos").desc, col("c_id"))
    val probes = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .crossJoin(broadcast(centroids))
      .withColumn("c_cos", coalesce(expr("cosine_sim(q_vec, c_vec)"), lit(-1.0)))
      .withColumn("r", row_number().over(wProbe)).filter(col("r") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("c_id").as("bucket"))
      .localCheckpoint()
    // the probed bucket ids ARE the partition filter: collecting them is
    // O(|Q|·nprobe) scalars, and isin() prunes the scan to those directories
    val bucketIds = probes.select(col("bucket")).distinct()
      .collect().map(_.get(0)).toSeq
    val corpus = spark.read.parquet(s"$path/buckets")
      .filter(col("bucket").isin(bucketIds: _*))
    val scored = corpus.join(broadcast(probes), "bucket")
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", expr("cosine_sim(q_vec, n_vec)"))
      .select(col("q_id"), col("n_id"), col("cos"))
    val top = graft.plans.TopK.perKey(scored, Seq("q_id"),
      Seq(col("cos").desc, col("n_id").asc), k)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    top.withColumn("rnk", row_number().over(w))
      .select(col("q_id"), col("n_id"), col("rnk"))
  }
}
