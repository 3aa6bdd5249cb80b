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
  * Appends commit at DIRECTORY granularity: each batch's bands are written
  * to a staging subdir with their own job commit, then ONE atomic rename
  * moves the whole directory into the live layout as a `batch=<uuid>`
  * partition. Either the entire batch's bands are visible or none are —
  * no assumption that a document's band rows share a part file — and a
  * re-run after a crash anti-joins away the ids that made it in, so
  * retries converge with neither duplicates nor holes.
  */
object IncrementalDedup {

  private def bandsOf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    MinHashLsh.signatures(docs, idCol, textCol)
      .select(col(idCol).as("doc_id"),
        explode(array((0 until MinHashLsh.Bands).map(MinHashLsh.bandKey): _*)).as("bk"))

  /** The live band table: part files under `bands/batch=&#42;` — the batch
    * partition column is layout bookkeeping, never read. */
  private def readBands(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/bands").select(col("doc_id"), col("bk"))

  /** Dedup store bootstrap: band keys for the existing corpus. */
  def buildStore(docs: DataFrame, idCol: String, textCol: String, path: String): Unit =
    bandsOf(docs, idCol, textCol)
      .write.mode("overwrite").parquet(s"$path/bands/batch=base")

  /** Ingest a batch's band keys into the store (crash-safe, idempotent).
    * Call AFTER probing the batch so a document never pairs with itself. */
  def appendToStore(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, textCol: String): Unit = {
    import org.apache.hadoop.fs.Path
    val staging = new Path(s"$path/_staging_append")
    val fs = staging.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(staging, true) // clear any crashed prior attempt's leftovers
    val existing = readBands(spark, path).select(col("doc_id").as(idCol)).distinct()
    val fresh = batch.join(existing, Seq(idCol), "left_anti")
    if (fresh.isEmpty) return // fully-replayed batch: nothing fresh to land
    bandsOf(fresh, idCol, textCol).write.mode("overwrite").parquet(staging.toString)
    // one atomic directory rename commits the WHOLE batch or nothing
    val live = new Path(s"$path/bands/batch=${java.util.UUID.randomUUID()}")
    require(fs.rename(staging, live), s"rename $staging -> $live failed")
  }

  /** Candidate near-dup pairs between a new batch and the stored corpus:
    * (batch_id, corpus_id), distinct. Signature work touches ONLY the
    * batch; the corpus contributes pre-computed band keys from disk.
    * Batch documents already present in the store pair with themselves —
    * filtered here so re-ingests are quiet. */
  def probe(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val stored = readBands(spark, path)
      .select(col("doc_id").as("corpus_id"), col("bk"))
    bandsOf(batch, idCol, textCol)
      .select(col("doc_id").as("batch_id"), col("bk"))
      .join(stored, Seq("bk"))
      .filter(col("batch_id") =!= col("corpus_id"))
      .select(col("batch_id"), col("corpus_id")).distinct()
  }
}
