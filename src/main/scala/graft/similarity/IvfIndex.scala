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
