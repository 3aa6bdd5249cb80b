package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped cache of materialized (localCheckpoint'd) pipeline
  * stages — the in-memory stand-in for the signature/staging tables a
  * 100 TB pipeline keeps NEXT TO the corpus so consecutive operators
  * never re-derive the same pass (dedup signatures, n2k export spans).
  *
  * Lifecycle is explicit: entries are keyed by (session identity, key) and
  * live until `release` — which both evicts the entry AND unpersists the
  * checkpoint blocks behind it (CheckpointBridge), so a long-lived session
  * iterating over many datasets can return the executor memory of stages
  * it is done with instead of pinning every checkpoint for the session
  * lifetime. Key convention: "family:dataset:stage" so one release-by-
  * prefix drops a whole family's stages for one dataset.
  */
object StageCache {

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def qualify(s: SparkSession, key: String): String =
    System.identityHashCode(s).toString + "/" + key

  /** The stage for (session, key), computing and caching on first use.
    * The compute runs under the map's per-key lock — concurrent callers
    * of the SAME stage wait for one computation (the DedupQ discipline);
    * different keys never contend. */
  def getOrCompute(s: SparkSession, key: String)(f: => DataFrame): DataFrame =
    cache.computeIfAbsent(qualify(s, key), _ => f)

  /** Evict every stage of (session, keyPrefix*) and unpersist its
    * checkpoint blocks. Prefix "" drops all of the session's stages.
    * @return number of entries released */
  def release(s: SparkSession, keyPrefix: String = ""): Int = {
    import scala.jdk.CollectionConverters._
    val pre = qualify(s, keyPrefix)
    val keys = cache.keySet.asScala.filter(_.startsWith(pre)).toList
    keys.count { k =>
      Option(cache.remove(k)).exists { df =>
        org.apache.spark.sql.graftshim.CheckpointBridge.releaseBlocks(df); true
      }
    }
  }

  /** Spec probe: is the stage present AND its blocks still persisted? */
  private[graft] def isLive(s: SparkSession, key: String): Boolean =
    Option(cache.get(qualify(s, key)))
      .exists(org.apache.spark.sql.graftshim.CheckpointBridge.isPersisted)
}
