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

  /** Per-key lazy cell: the builder runs under THIS holder's monitor (the
    * Scala lazy-val lock), NOT inside the ConcurrentHashMap mapping
    * function. Stage builders routinely request their prerequisite stages
    * (fullCanonical → jaccardScored → candidates → stage; N2k spans and
    * the PQ caches share the same map) — running them inside
    * computeIfAbsent would violate its no-recursive-update contract and
    * throw IllegalStateException (or corrupt under a resize) whenever two
    * nested keys land in one hash bin. With the holder pattern the map
    * mapping function only allocates the cell (no user code), so nesting
    * recurses through independent per-key locks. Concurrent callers of
    * the SAME stage still wait for one computation. */
  private final class Holder(f: () => DataFrame) {
    @volatile private var computed = false
    lazy val value: DataFrame = { val v = f(); computed = true; v }
    /** The frame if already built; None for an in-flight or never-run
      * build. Deliberately NOT synchronized on the lazy-val monitor: a
      * blocking peek would make release() wait out an in-flight build and
      * then unpersist the frame the builder is about to return —
      * localCheckpoint blocks are not recomputable, so that frees state
      * under a live caller. Non-blocking peek keeps the contract
      * "uncomputed holders evict without touching blocks"; the builder's
      * re-map in getOrCompute makes the finished stage releasable again. */
    def peek: Option[DataFrame] = if (computed) Some(value) else None
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Holder]()

  private def qualify(s: SparkSession, key: String): String =
    System.identityHashCode(s).toString + "/" + key

  /** The stage for (session, key), computing and caching on first use.
    * Safe for builders that themselves call getOrCompute (see Holder) —
    * PROVIDED the stage dependency graph is acyclic: prerequisite stages
    * must form a DAG (fullCanonical → jaccardScored → candidates → stage).
    * Two threads building stages with INVERSE prerequisite orders would
    * deadlock on each other's lazy-val monitors, so a cyclic request
    * fails fast (IllegalArgumentException — a require() on the
    * per-thread build stack, pinned by StageCacheSpec) instead of
    * hanging.
    *
    * If release() concurrently evicts the entry while the build is in
    * flight (peek waits out the lazy-val monitor on a COMPUTED holder,
    * but an uncomputed one is removed without touching blocks), the
    * freshly-built frame's checkpoint blocks would otherwise leak until
    * session end with no cache entry pointing at them. Releasing them
    * here would break THIS caller (localCheckpoint blocks are not
    * recomputable), so instead the built holder is re-mapped
    * (putIfAbsent): the stage is visible again and the NEXT release
    * cleans it — semantically "the stage was recomputed after the
    * release", which is exactly what happened. Only the double race
    * (evicted AND re-requested by a third thread before the re-map)
    * leaves one orphaned frame for the session lifetime. */
  def getOrCompute(s: SparkSession, key: String)(f: => DataFrame): DataFrame = {
    val qualified = qualify(s, key)
    val stack = buildStack.get()
    require(!stack.contains(qualified),
      s"StageCache cycle: ${stack.mkString(" -> ")} -> $qualified — stage prerequisites must form a DAG")
    val h = cache.computeIfAbsent(qualified, _ => new Holder(() => f))
    stack.push(qualified)
    val v = try h.value finally stack.pop()
    if (cache.get(qualified) ne h) cache.putIfAbsent(qualified, h)
    v
  }

  /** Per-thread stack of keys currently building — cycle detection for
    * nested getOrCompute (fail fast, never deadlock). */
  private val buildStack =
    ThreadLocal.withInitial[scala.collection.mutable.Stack[String]](
      () => scala.collection.mutable.Stack.empty[String])

  /** Evict every stage of (session, keyPrefix*) and unpersist its
    * checkpoint blocks. Prefix "" drops all of the session's stages.
    * An entry whose build never ran (or is in flight — peek waits it out)
    * is evicted without touching the block manager.
    * @return number of entries released */
  def release(s: SparkSession, keyPrefix: String = ""): Int = {
    import scala.jdk.CollectionConverters._
    val pre = qualify(s, keyPrefix)
    val keys = cache.keySet.asScala.filter(_.startsWith(pre)).toList
    keys.count { k =>
      Option(cache.remove(k)).exists { h =>
        h.peek.foreach(org.apache.spark.sql.graftshim.CheckpointBridge.releaseBlocks)
        true
      }
    }
  }

  /** Spec probe: is the stage present AND its blocks still persisted? */
  private[graft] def isLive(s: SparkSession, key: String): Boolean =
    Option(cache.get(qualify(s, key))).flatMap(_.peek)
      .exists(org.apache.spark.sql.graftshim.CheckpointBridge.isPersisted)
}
