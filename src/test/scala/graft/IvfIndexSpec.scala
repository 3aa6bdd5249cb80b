package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.{IvfIndex, Knn}

/** The index contract: expensive work at build time, bounded work at probe
  * time. The decisive assert is partition pruning — a probe must READ only
  * its nprobe buckets, not scan-then-filter the corpus. */
class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val path = "/tmp/graft_ivf_spec"

  test("build once, probe twice: identical results, and the probe scan prunes to the probed buckets") {
    val e = Tables.embeddings(spark, dir)
    IvfIndex.build(spark, e, "vec_id", "embedding", path, iters = 2)
    // C defaults to ~sqrt(N)
    val c = spark.read.parquet(s"$path/centroids").count()
    val n = e.count()
    assert(math.abs(c - math.round(math.sqrt(n.toDouble))) <= 1, s"C=$c for N=$n")
    // every corpus vector landed in exactly one bucket
    assert(spark.read.parquet(s"$path/buckets").count() == n)

    val q = e.filter(col("vec_id") % 50 === 0)
    val p1 = IvfIndex.probe(spark, path, q, "vec_id", "embedding", 5, 2)
    val r1 = p1.orderBy("q_id", "rnk").as[(Long, Long, Int)].collect().toSeq
    assert(r1.nonEmpty && r1.groupBy(_._1).values.forall(_.size <= 5))

    val p2 = IvfIndex.probe(spark, path, q, "vec_id", "embedding", 5, 2)
    val r2 = p2.orderBy("q_id", "rnk").as[(Long, Long, Int)].collect().toSeq
    assert(r2 == r1, "probing a built index must be deterministic")

    // the scan carries a static partition filter on bucket — pruning, not
    // scan-then-filter; with C≈22 and nprobe=2 the probed set is a strict
    // subset so the filter is a genuine IN list
    val plan = p2.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"no partition filter on the probe scan:\n${plan.take(3000)}")
    val pruned = "PartitionFilters: \\[[^\\]]*bucket[^\\]]*IN".r
    assert(pruned.findFirstIn(plan).isDefined,
      s"bucket IN pruning missing:\n${plan.take(3000)}")
  }

  test("build sizes C from parquet footers: defaulted C adds ZERO jobs over an explicit C") {
    // a defaulted centroid count must come from driver-side footer
    // metadata, never a corpus count() pass — proven by job parity with
    // an explicitly sized build of the same C
    val e = Tables.embeddings(spark, dir)
    val c = math.round(math.sqrt(e.count().toDouble)).toInt
    def jobsFor(group: String)(body: => Unit): Int = {
      spark.sparkContext.setJobGroup(group, group)
      try body finally spark.sparkContext.clearJobGroup()
      // statusTracker fills from the async listener bus — poll to stable
      var last = -1; var cur = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
      var i = 0
      while (cur != last && i < 50) { last = cur; Thread.sleep(100)
        cur = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length; i += 1 }
      cur
    }
    val defaulted = jobsFor("ivf-c-default") {
      IvfIndex.build(spark, e, "vec_id", "embedding", s"${path}_cdef", iters = 1) }
    val explicit = jobsFor("ivf-c-explicit") {
      IvfIndex.build(spark, e, "vec_id", "embedding", s"${path}_cexp",
        numCentroids = Some(c), iters = 1) }
    assert(defaulted == explicit,
      s"defaulted-C build ran $defaulted jobs vs $explicit with explicit C — a corpus count() leaked in")
    // and the footer estimate produced the same √N grid
    assert(spark.read.parquet(s"${path}_cdef/centroids").count() == c)
  }

  test("append ingests without retraining: appended vectors are probeable, corpus count grows") {
    val e = Tables.embeddings(spark, dir)
    val path = s"${this.path}_append"
    val base = e.filter(col("vec_id") < 400)
    val extra = e.filter(col("vec_id") >= 400)
    IvfIndex.build(spark, base, "vec_id", "embedding", path, iters = 2)
    IvfIndex.append(spark, path, extra, "vec_id", "embedding")
    assert(spark.read.parquet(s"$path/buckets").count() == e.count())
    // probe with an appended vector under a foreign id: the appended row
    // itself must come back as the top hit (cosine 1 with itself)
    val probeVec = extra.orderBy(col("vec_id")).limit(1)
      .select(lit(-1L).as("vec_id"), col("embedding"))
    val wantedId = extra.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id")).as[Long].head()
    val top = IvfIndex.probe(spark, path, probeVec, "vec_id", "embedding", 1, 2)
      .select("n_id").as[Long].head()
    assert(top == wantedId, s"appended vector $wantedId not retrieved (got $top)")
  }

  test("append survives a crash mid-commit: partial rename + stale staging converge on retry") {
    import org.apache.hadoop.fs.Path
    val e = Tables.embeddings(spark, dir)
    val path = s"${this.path}_crash"
    val base = e.filter(col("vec_id") < 400)
    val extra = e.filter(col("vec_id") >= 400)
    IvfIndex.build(spark, base, "vec_id", "embedding", path, iters = 2)

    // reproduce the crashed state by hand: phase 1 (staging write) done,
    // phase 2 (rename into live) died after moving exactly ONE bucket
    val staging = new Path(s"$path/_staging_append")
    val fs = staging.getFileSystem(spark.sessionState.newHadoopConf())
    val cent = spark.read.parquet(s"$path/centroids")
    Knn.assignBuckets(spark, extra, cent, "vec_id", "embedding")
      .write.mode("overwrite").partitionBy("bucket").parquet(staging.toString)
    val firstBucket = fs.listStatus(staging)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket=")).head.getPath
    val dest = new Path(s"$path/buckets/${firstBucket.getName}")
    fs.mkdirs(dest)
    for (f <- fs.listStatus(firstBucket) if f.getPath.getName.startsWith("part-"))
      assert(fs.rename(f.getPath, new Path(dest, f.getPath.getName)))
    val placedSoFar = spark.read.parquet(s"$path/buckets").count()
    assert(placedSoFar > base.count() && placedSoFar < e.count(),
      "crash simulation should leave a strictly partial append visible")

    // recovery story = rerun the same append call
    IvfIndex.append(spark, path, extra, "vec_id", "embedding")
    val ids = spark.read.parquet(s"$path/buckets").select("n_id")
    assert(ids.count() == e.count(), "holes after recovery")
    assert(ids.distinct().count() == e.count(), "duplicates after recovery")
    assert(!fs.exists(staging), "staging left behind after commit")
    // and the live layout never held a torn file: a full read succeeds with
    // every vector probeable
    val probeVec = extra.orderBy(col("vec_id")).limit(1)
      .select(lit(-1L).as("vec_id"), col("embedding"))
    val wantedId = extra.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id")).as[Long].head()
    val top = IvfIndex.probe(spark, path, probeVec, "vec_id", "embedding", 1, 2)
      .select("n_id").as[Long].head()
    assert(top == wantedId)
  }

  test("index probe recall matches the inline IVF path (same centroids, same assignment)") {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") % 50 === 0)
    // self-contained: build into an own path so this test neither depends on
    // the other test's ordering nor on stale /tmp state from a prior session
    val path = s"${this.path}_inline"
    IvfIndex.build(spark, e, "vec_id", "embedding", path, iters = 2)
    val cent = spark.read.parquet(s"$path/centroids")
    val inline = Knn.ivf(spark, e, q, cent, "vec_id", "embedding", 5, 2)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val indexed = IvfIndex.probe(spark, path, q, "vec_id", "embedding", 5, 2)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(indexed == inline, "persisted index must agree with the inline composition")
  }

  test("rebuildIfImbalanced: trigger consumes the stats signal, splits only hot cells, balanced index untouched") {
    val e = Tables.embeddings(spark, dir)
    val path = s"${this.path}_rebuild"
    // deliberately pathological coarse model: one centroid at a corpus
    // vector (captures ~everything under cosine) + one at its negation —
    // the drifted-index shape the stats signal exists to catch
    val seed = e.orderBy(col("vec_id")).limit(1)
      .select(col("embedding").cast("array<double>").as("c_vec"))
    val bad = seed.select(lit(0L).as("c_id"), col("c_vec"))
      .unionByName(seed.select(lit(1L).as("c_id"),
        transform(col("c_vec"), x => -x).as("c_vec")))
    IvfIndex.build(spark, e, "vec_id", "embedding", path, pretrained = Some(bad))
    val n = e.count()
    val before = IvfIndex.stats(spark, path)
      .select(max(col("share"))).as[Double].head()
    assert(before > 0.5, s"fixture not imbalanced (max share $before)")

    // trigger fires, splits the hot cell 4-ways, leaves the cold cell alone
    assert(IvfIndex.rebuildIfImbalanced(spark, path, maxShare = 0.5, splitFactor = 4))
    val stAfter = IvfIndex.stats(spark, path).select("share").as[Double].collect()
    assert(stAfter.max < before, s"split did not reduce max share: ${stAfter.max}")
    // no vector lost or duplicated by the swap
    val ids = spark.read.parquet(s"$path/buckets").select("n_id")
    assert(ids.count() == n && ids.distinct().count() == n)
    // centroid table grew by (splitFactor - 1) per split cell and stayed unique
    val cents = spark.read.parquet(s"$path/centroids").select("c_id").as[Long].collect()
    assert(cents.length == cents.distinct.length)
    // the rebuilt index still serves probes over every vector
    val q = e.filter(col("vec_id") % 50 === 0)
    val r = IvfIndex.probe(spark, path, q, "vec_id", "embedding", 5, 2)
    assert(r.count() > 0 && r.groupBy("q_id").count().agg(max("count")).as[Long].head() <= 5)

    // post-rebuild the signal is quiet at a realistic threshold: the
    // trigger is idempotent-when-balanced and must not touch files
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val mtBefore = fs.getFileStatus(new org.apache.hadoop.fs.Path(s"$path/centroids")).getModificationTime
    val threshold = stAfter.max + 0.01
    assert(!IvfIndex.rebuildIfImbalanced(spark, path, maxShare = threshold))
    val mtAfter = fs.getFileStatus(new org.apache.hadoop.fs.Path(s"$path/centroids")).getModificationTime
    assert(mtBefore == mtAfter, "no-op trigger must not rewrite the index")
  }

  test("tuneNprobe: meets the recall target with bounded probes; exhaustive probing recalls 1.0") {
    val e = Tables.embeddings(spark, dir)
    val path = s"${this.path}_tune"
    IvfIndex.build(spark, e, "vec_id", "embedding", path, iters = 2)
    val q = e.filter(col("vec_id") % 50 === 0)
    val cMax = spark.read.parquet(s"$path/centroids").count().toInt
    // an unreachable target drives the loop to the cap, where probing
    // every bucket IS brute force — recall must be exactly 1.0
    val (npAll, recAll) = IvfIndex.tuneNprobe(spark, path, q, "vec_id", "embedding", 5, 1.01)
    assert(npAll == cMax && recAll == 1.0,
      s"exhaustive probe must equal brute force (np=$npAll rec=$recAll)")
    // a modest target is met without exhaustive probing
    val (npLow, recLow) = IvfIndex.tuneNprobe(spark, path, q, "vec_id", "embedding", 5, 0.5)
    assert(recLow >= 0.5, s"returned recall $recLow below target")
    assert(npLow <= npAll)
  }

  test("rebuild crash windows are recoverable: orphan sub-cells dropped, half-done centroid swap finished or rolled back") {
    import org.apache.hadoop.fs.Path
    val e = Tables.embeddings(spark, dir)
    val path = s"${this.path}_repair"
    IvfIndex.build(spark, e, "vec_id", "embedding", path, iters = 2)
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val n = e.count()
    val q = e.filter(col("vec_id") % 50 === 0)
    def probeOk(): Unit = {
      val r = IvfIndex.probe(spark, path, q, "vec_id", "embedding", 5, 2)
      assert(r.count() > 0)
    }
    def copyDir(from: Path, to: Path): Unit = {
      fs.mkdirs(to)
      for (f <- fs.listStatus(from) if f.isFile)
        org.apache.hadoop.fs.FileUtil.copy(fs, f.getPath, fs,
          new Path(to, f.getPath.getName), false, spark.sessionState.newHadoopConf())
    }

    // window 1: crash AFTER sub-cell files committed, BEFORE the centroid
    // swap — an unreferenced bucket directory sits in the live layout.
    // Re-running must drop the orphan (its vectors still live in the
    // original, not-yet-deleted buckets) instead of colliding with a
    // later split's fresh cell ids.
    val someBucket = fs.listStatus(new Path(s"$path/buckets"))
      .filter(_.getPath.getName.startsWith("bucket=")).head.getPath
    val orphan = new Path(s"$path/buckets/bucket=999")
    copyDir(someBucket, orphan)
    assert(fs.exists(orphan))
    IvfIndex.rebuildIfImbalanced(spark, path, maxShare = 1.1) // balanced: repair-only pass
    assert(!fs.exists(orphan), "repair must drop bucket dirs the centroid table does not reference")
    assert(spark.read.parquet(s"$path/buckets").count() == n, "no vector lost by orphan cleanup")
    probeOk()

    // window 2: crash BETWEEN the two pointer renames — live centroids
    // moved aside, staged table fully committed. Repair must promote the
    // staged table (its _SUCCESS exists).
    val live = new Path(s"$path/centroids")
    val staged = new Path(s"$path/_staging_centroids")
    copyDir(live, staged)
    require(fs.rename(live, new Path(s"$path/_retired_centroids")))
    assert(!fs.exists(live))
    IvfIndex.rebuildIfImbalanced(spark, path, maxShare = 1.1)
    assert(fs.exists(live) && !fs.exists(staged), "repair must promote the committed staged table")
    probeOk()

    // window 3: crash AFTER live moved aside with an INCOMPLETE staged
    // write (no _SUCCESS). Repair must roll back to the retired table.
    val retired = new Path(s"$path/_retired_centroids")
    require(fs.rename(live, retired))
    fs.mkdirs(staged) // torn staged dir: no _SUCCESS marker
    IvfIndex.rebuildIfImbalanced(spark, path, maxShare = 1.1)
    assert(fs.exists(live) && !fs.exists(retired) && !fs.exists(staged),
      "repair must restore the retired table when staging is incomplete")
    probeOk()
  }
}
