package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write–Audit–Publish for file snapshots — the lakehouse analogue of the
  * reference's staged-table transaction: a new snapshot lands in an
  * UNPUBLISHED staging directory, the audit (Quarantine/Validate rules)
  * runs against the staged files, and only a passing audit atomically
  * swings the `current` pointer. Readers resolve through the pointer, so
  * they see the previous snapshot until the instant of publish, a failed
  * audit leaves production untouched with the staged files parked for
  * inspection, and the superseded snapshot stays on disk for rollback.
  *
  * Layout under `root/`:
  *   snap-<label>/   immutable snapshot directories (parquet)
  *   current         one-line pointer file naming the published snapshot
  *
  * The publish step is a pointer-file REPLACE: write tmp + overwriting
  * rename (FileContext.rename OVERWRITE — atomic on HDFS, so concurrent
  * readers see the old pointer or the new one, never a torn state). On
  * filesystems without that binding the swap falls back to
  * delete-then-rename, which opens a brief pointer-absent window;
  * currentLabel bridges it with a bounded retry. (On object stores
  * without atomic rename, swap the pointer file for a metastore/catalog
  * entry — same contract, same seam.)
  */
object Wap {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  /** Stage a snapshot: write `df` under snap-<label>, NOT visible to
    * readers until publish. Returns the staged path. */
  def stage(spark: SparkSession, root: String, label: String, df: DataFrame): String = {
    val path = s"$root/snap-$label"
    df.write.mode("overwrite").parquet(path)
    path
  }

  /** Audit a staged snapshot with quarantine rules; returns the count of
    * violating rows (0 = clean). The audit reads the STAGED FILES — what
    * will be published, not the frame that produced them. */
  def audit(spark: SparkSession, root: String, label: String,
      rules: Seq[Quarantine.Rule]): Long =
    Quarantine.annotate(spark.read.parquet(s"$root/snap-$label"), rules)
      .filter(col("quarantine_reasons").isNotNull).count()

  /** Atomically publish a staged snapshot: replace the `current` pointer.
    * Throws if the audit finds violations — production stays on the
    * previous snapshot and the staged directory is left for inspection. */
  def publish(spark: SparkSession, root: String, label: String,
      rules: Seq[Quarantine.Rule]): Unit = {
    val bad = audit(spark, root, label, rules)
    require(bad == 0L,
      s"audit failed for snap-$label: $bad violating rows — not publishing")
    swing(spark, root, label)
  }

  /** The pointer swap alone (caller has already audited). */
  private def swing(spark: SparkSession, root: String, label: String): Unit = {
    val f = fs(spark, root)
    val tmp = new Path(s"$root/current.tmp")
    val cur = new Path(s"$root/current")
    val out = f.create(tmp, true)
    try out.write(s"snap-$label".getBytes("UTF-8")) finally out.close()
    // overwriting rename: atomic pointer swap where the filesystem offers
    // it (HDFS); fall back to delete-then-rename elsewhere — readers
    // bridge that window via currentLabel's retry. The fallback catch is
    // deliberately broad (not just UnsupportedFileSystemException): some
    // object-store bindings resolve a FileContext but then throw
    // IOException / UnsupportedOperationException from Rename.OVERWRITE —
    // aborting there would leave the tmp pointer written and NO swap
    // attempted, stranding the publish.
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        f.getUri, spark.sessionState.newHadoopConf())
      fc.rename(f.makeQualified(tmp), f.makeQualified(cur),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: java.io.IOException | _: UnsupportedOperationException =>
        f.delete(cur, false)
        require(f.rename(tmp, cur), s"pointer swap failed for snap-$label")
    }
  }

  /** The published snapshot's label, if any. Retries briefly on an absent
    * pointer so the fallback (non-atomic) publish path's momentary window
    * reads as the old-or-new contract rather than a spurious None. */
  def currentLabel(spark: SparkSession, root: String): Option[String] = {
    val f = fs(spark, root)
    val cur = new Path(s"$root/current")
    def readOnce(): Option[String] =
      if (!f.exists(cur)) None
      else {
        val in = f.open(cur)
        try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim)
        finally in.close()
      }
    Iterator.range(0, 3).map { i =>
      if (i > 0) Thread.sleep(50L)
      readOnce()
    }.collectFirst { case Some(l) => l }
  }

  /** Read through the pointer: the published snapshot, as readers do. */
  def readCurrent(spark: SparkSession, root: String): DataFrame = {
    val label = currentLabel(spark, root).getOrElse(
      throw new IllegalStateException(s"no published snapshot under $root"))
    spark.read.parquet(s"$root/$label")
  }

  // ---- Time travel: the version log over published snapshots ---------
  //
  // The Iceberg/Delta AS-OF surface in miniature: every versioned publish
  // appends an immutable `versions/v-<seq>` file naming its snapshot, so
  // the full publish history is queryable and any past version readable —
  // snapshots are already immutable and retained (the rollback contract
  // above), the log only gives them stable ordinals. The log entry is
  // written BEFORE the pointer swap (tmp + fresh-name rename — never
  // overwritten, so no atomicity demands on the store): a crash between
  // the two leaves the log one entry AHEAD of `current`, which reads as
  // "staged at version v, publish incomplete" — re-running the publish
  // converges (the entry for that label is reused, not duplicated);
  // `current` never points at an unlogged snapshot.

  private def versionDir(root: String) = new Path(s"$root/versions")

  /** Publish history: (version, snapshot label), version-ascending. */
  def history(spark: SparkSession, root: String): Seq[(Long, String)] = {
    val f = fs(spark, root)
    val dir = versionDir(root)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .map(_.getPath.getName).filter(_.startsWith("v-"))
      .map { n =>
        val in = f.open(new Path(dir, n))
        val label = try new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
        finally in.close()
        (n.stripPrefix("v-").toLong, label)
      }.sortBy(_._1)
  }

  /** Publish with a version-log entry; returns the assigned version.
    * The audit runs BEFORE the log append (a vetoed snapshot must never
    * occupy a version), the log before the pointer swap (see the class
    * note). Idempotent per label: re-publishing a label that already has
    * a log entry reuses its version (the crash-recovery path). */
  def publishVersioned(spark: SparkSession, root: String, label: String,
      rules: Seq[Quarantine.Rule]): Long = {
    val bad = audit(spark, root, label, rules)
    require(bad == 0L,
      s"audit failed for snap-$label: $bad violating rows — not publishing")
    val f = fs(spark, root)
    val hist = history(spark, root)
    val version = hist.find(_._2 == s"snap-$label").map(_._1).getOrElse {
      val next = hist.lastOption.map(_._1 + 1).getOrElse(1L)
      f.mkdirs(versionDir(root))
      val tmp = new Path(versionDir(root), s".v-$next.tmp")
      val out = f.create(tmp, true)
      try out.write(s"snap-$label".getBytes("UTF-8")) finally out.close()
      require(f.rename(tmp, new Path(versionDir(root), s"v-$next")),
        s"version-log append failed for snap-$label")
      next
    }
    swing(spark, root, label)
    version
  }

  /** Read the table AS OF a published version. */
  def readAsOf(spark: SparkSession, root: String, version: Long): DataFrame = {
    val label = history(spark, root).find(_._1 == version).map(_._2).getOrElse(
      throw new IllegalArgumentException(s"no version $version under $root"))
    spark.read.parquet(s"$root/$label")
  }

  /** Expire all but the newest `keepLast` published versions — the
    * expire-snapshots/VACUUM half of the snapshot-store lifecycle (the
    * version log grows monotonically; storage does not get to). Deletes
    * each expired version's snapshot directory AND its log entry;
    * version ordinals stay stable (gaps are legal — history stays
    * version-ascending). Refuses to expire the version `current` points
    * at: production must never lose its table out from under it, however
    * aggressive the retention. Returns the expired (version, label)
    * pairs, oldest first. */
  def vacuum(spark: SparkSession, root: String, keepLast: Int): Seq[(Long, String)] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val f = fs(spark, root)
    val hist = history(spark, root)
    val (expire, keep) = hist.splitAt(math.max(hist.size - keepLast, 0))
    currentLabel(spark, root).foreach { cur =>
      require(!expire.exists(_._2 == cur),
        s"refusing to expire $cur — the current pointer still references it " +
          s"(kept: ${keep.map(_._2)})")
    }
    expire.foreach { case (v, label) =>
      // log entry FIRST: a crash between the two deletes then leaves an
      // orphaned snapshot directory (benign, re-vacuumable) instead of a
      // dangling v-<n> entry whose readAsOf would die on FileNotFound.
      f.delete(new Path(versionDir(root), s"v-$v"), false)
      f.delete(new Path(s"$root/$label"), true)
    }
    expire
  }
}
