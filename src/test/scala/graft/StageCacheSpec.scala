package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle pin for the shared stage cache: stages are computed once per
  * (session, key), and release actually frees the checkpoint blocks — a
  * long-lived session iterating datasets must be able to return executor
  * memory, not pin every checkpoint until shutdown. */
class StageCacheSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("getOrCompute runs the builder once per key; release frees blocks and evicts") {
    var builds = 0
    def build() = { builds += 1; Seq(1, 2, 3).toDF("v").localCheckpoint(false) }
    val a = StageCache.getOrCompute(spark, "spec:dsA:stage")(build())
    assert(a.count() == 3 && builds == 1)
    StageCache.getOrCompute(spark, "spec:dsA:stage")(build())
    assert(builds == 1, "second lookup must hit the cache")
    assert(StageCache.isLive(spark, "spec:dsA:stage"),
      "materialized stage must hold persisted blocks")
    // release by dataset prefix: evicted AND blocks dropped
    assert(StageCache.release(spark, "spec:dsA:") == 1)
    assert(!StageCache.isLive(spark, "spec:dsA:stage"))
    assert(org.apache.spark.sql.graftshim.CheckpointBridge.isPersisted(a) == false,
      "release must unpersist the checkpoint RDD, not just evict the map entry")
    // next consumer recomputes cleanly
    val a2 = StageCache.getOrCompute(spark, "spec:dsA:stage")(build())
    assert(builds == 2 && a2.count() == 3)
    StageCache.release(spark, "spec:")
  }

  test("release is prefix-scoped: sibling datasets keep their stages") {
    StageCache.getOrCompute(spark, "spec2:dsA:sig")(Seq(1).toDF("v").localCheckpoint(false))
    StageCache.getOrCompute(spark, "spec2:dsB:sig")(Seq(2).toDF("v").localCheckpoint(false))
    assert(StageCache.release(spark, "spec2:dsA:") == 1)
    assert(!StageCache.isLive(spark, "spec2:dsA:sig"))
    assert(StageCache.isLive(spark, "spec2:dsB:sig"))
    StageCache.release(spark, "spec2:")
  }

  test("nested getOrCompute: builders may request prerequisite stages (no recursive-update hazard)") {
    // the DedupQ shape: fullCanonical → jaccardScored → candidates → stage
    // all nest through the ONE shared map. Running builders inside
    // ConcurrentHashMap.computeIfAbsent violates its no-recursive-update
    // contract (IllegalStateException when two keys share a hash bin —
    // nondeterministic per session since keys embed identityHashCode);
    // the Holder pattern must make ANY nesting depth safe. 200 key pairs
    // make bin collisions near-certain under the old implementation.
    var innerBuilds = 0
    for (i <- 0 until 200) {
      val outer = StageCache.getOrCompute(spark, s"nest:outer:$i") {
        val inner = StageCache.getOrCompute(spark, s"nest:inner:$i") {
          innerBuilds += 1; Seq(i).toDF("v").localCheckpoint(false)
        }
        inner.withColumn("w", col("v") * 2).localCheckpoint(false)
      }
      assert(outer.count() == 1)
    }
    assert(innerBuilds == 200)
    // three-deep nesting too (stage → candidates → jaccard)
    val deep = StageCache.getOrCompute(spark, "nest:l1") {
      StageCache.getOrCompute(spark, "nest:l2") {
        StageCache.getOrCompute(spark, "nest:l3") {
          Seq(42).toDF("v").localCheckpoint(false)
        }.localCheckpoint(false)
      }.localCheckpoint(false)
    }
    assert(deep.count() == 1)
    assert(StageCache.release(spark, "nest:") == 403)
  }

  test("cyclic stage prerequisites fail fast instead of deadlocking") {
    // two threads building mutually-dependent stages would deadlock on
    // each other's lazy-val monitors; the per-thread build stack turns
    // any cycle into a loud error at the point of re-entry.
    val e = intercept[IllegalArgumentException] {
      StageCache.getOrCompute(spark, "cyc:a") {
        StageCache.getOrCompute(spark, "cyc:b") {
          StageCache.getOrCompute(spark, "cyc:a") { // re-enters a: cycle
            Seq(1).toDF("v").localCheckpoint(false)
          }
        }
      }
    }
    assert(e.getMessage.contains("cycle"))
    StageCache.release(spark, "cyc:")
  }

  test("release during an in-flight build leaks nothing: the built stage re-maps") {
    // a release that lands while the builder is running evicts an
    // UNCOMPUTED holder (no blocks to free yet). getOrCompute must re-map
    // the freshly-built holder so the checkpoint blocks stay reachable —
    // the NEXT release frees them instead of leaking to session end.
    val frame = StageCache.getOrCompute(spark, "race:ds:stage") {
      // simulate the race deterministically: the eviction happens while
      // THIS build is in flight
      assert(StageCache.release(spark, "race:ds:") == 1)
      Seq(1, 2).toDF("v").localCheckpoint(false)
    }
    assert(frame.count() == 2)
    assert(StageCache.isLive(spark, "race:ds:stage"),
      "built-during-release stage must be re-mapped, not orphaned")
    assert(StageCache.release(spark, "race:ds:") == 1)
    assert(!org.apache.spark.sql.graftshim.CheckpointBridge.isPersisted(frame),
      "the re-mapped stage's blocks must be freed by the next release")
  }

  test("DedupQ.release drops the dedup family's stages for one dataset") {
    val dir = "/root/testdata/sf0.001"
    // drive a gate that populates the signature stage
    graft.queries.DedupQ.dExact(spark, dir).queryExecution.toRdd.count()
    assert(StageCache.isLive(spark, s"dedup:$dir:sig"))
    assert(graft.queries.DedupQ.release(spark, dir) >= 1)
    assert(!StageCache.isLive(spark, s"dedup:$dir:sig"))
    // gates over the dataset still work after release (recompute)
    assert(graft.queries.DedupQ.dExact(spark, dir).queryExecution.toRdd.count() > 0)
  }
}
