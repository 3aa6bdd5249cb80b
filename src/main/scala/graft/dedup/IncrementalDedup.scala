package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental fuzzy dedup against a PERSISTED signature store — the
  * realistic 100 TB ingest shape: the corpus is deduped once, its MinHash
  * band keys land on disk, and every subsequent batch (a new crawl dump)
  * pays only O(|batch|) signature work plus one band-key equality join —
  * the corpus text is never re-read, let alone re-hashed, per ingest.
  *
  * Store layout: `path/bands` parquet of (doc_id, bk) — fixed-width band
  * keys, ~Bands rows per document; a sliver of the corpus bytes. At scale,
  * lay the store out bucketed on `bk` (bucketBy in a catalog) so the probe
  * join shuffles only the batch side; the plain-parquet layout here still
  * never rescans corpus TEXT, which is the dominant cost.
  *
  * Appends use the same staged rename-commit discipline as
  * [[graft.similarity.IvfIndex.append]]: batch bands are written to a
  * staging subdir with their own job commit, then moved file-atomically
  * into the live layout, and a re-run after a crash anti-joins away the
  * ids that made it in — convergent, no duplicates, no holes.
  */
object IncrementalDedup {

  private def bandsOf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    MinHashLsh.signatures(docs, idCol, textCol)
      .select(col(idCol).as("doc_id"),
        explode(array((0 until MinHashLsh.Bands).map(MinHashLsh.bandKey): _*)).as("bk"))

  /** Dedup store bootstrap: band keys for the existing corpus. */
  def buildStore(docs: DataFrame, idCol: String, textCol: String, path: String): Unit =
    bandsOf(docs, idCol, textCol).write.mode("overwrite").parquet(s"$path/bands")

  /** Ingest a batch's band keys into the store (crash-safe, idempotent).
    * Call AFTER probing the batch so a document never pairs with itself. */
  def appendToStore(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, textCol: String): Unit = {
    import org.apache.hadoop.fs.Path
    val staging = new Path(s"$path/_staging_append")
    val fs = staging.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(staging, true) // clear any crashed prior attempt's leftovers
    val existing = spark.read.parquet(s"$path/bands").select(col("doc_id").as(idCol)).distinct()
    val fresh = batch.join(existing, Seq(idCol), "left_anti")
    bandsOf(fresh, idCol, textCol).write.mode("overwrite").parquet(staging.toString)
    val live = new Path(s"$path/bands")
    for (f <- fs.listStatus(staging) if f.getPath.getName.startsWith("part-")) {
      val to = new Path(live, f.getPath.getName) // job-UUID names cannot collide
      require(fs.rename(f.getPath, to), s"rename ${f.getPath} -> $to failed")
    }
    fs.delete(staging, true)
  }

  /** Candidate near-dup pairs between a new batch and the stored corpus:
    * (batch_id, corpus_id), distinct. Signature work touches ONLY the
    * batch; the corpus contributes pre-computed band keys from disk.
    * Batch documents already present in the store pair with themselves —
    * filtered here so re-ingests are quiet. */
  def probe(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val stored = spark.read.parquet(s"$path/bands")
      .select(col("doc_id").as("corpus_id"), col("bk"))
    bandsOf(batch, idCol, textCol)
      .select(col("doc_id").as("batch_id"), col("bk"))
      .join(stored, Seq("bk"))
      .filter(col("batch_id") =!= col("corpus_id"))
      .select(col("batch_id"), col("corpus_id")).distinct()
  }
}
