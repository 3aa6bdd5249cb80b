package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a dedup pair graph — the step that turns a
  * pair list (MinHash/SimHash/embedding candidates, Jaccard-verified) into
  * the (doc_id, canonical_id) assignment a training-data pipeline actually
  * consumes: one survivor per duplicate cluster, everything else mapped to
  * it.
  *
  * Algorithm: iterative min-label propagation, DataFrame-only. Every vertex
  * starts labeled with its own id; each round takes the min of its own and
  * its neighbors' labels; convergence when no label changes. Each round is
  * two key-shuffles (edge join + groupBy vertex) over data proportional to
  * |E|, and rounds = graph diameter. Dedup graphs are near-clique clusters
  * with tiny diameter (a pair graph at Jaccard ≥ 0.5 is dense within a
  * cluster), so this converges in a handful of rounds at any corpus size —
  * the pathological long-path graphs that need O(log n) star-contraction
  * variants do not arise from similarity blocking. The loop state is
  * localCheckpoint'ed each round so lineage stays flat, and the driver only
  * ever sees one scalar (the changed-count) per round.
  *
  * Fault-tolerance: `reliable = false` (default) uses localCheckpoint —
  * fast, but blocks are not replicated, so a lost executor fails the job
  * (which then restarts from the source). For long-running 100 TB jobs,
  * configure `spark.sparkContext.setCheckpointDir` and pass
  * `reliable = true`: the loop state lands in reliable `checkpoint()`
  * storage each round and survives executor loss. Same algorithm, same
  * results — ComponentsSpec runs both paths against each other.
  */
object Components {

  /** (id, lbl) for every vertex of the pair graph: lbl = min id of the
    * vertex's connected component. Input needs columns (aCol, bCol).
    * @param reliable use reliable checkpoint() for loop state (requires
    *                 a configured checkpoint dir) instead of
    *                 localCheckpoint — see the class note. */
  def labels(pairs: DataFrame, aCol: String = "a_id", bCol: String = "b_id",
      maxIters: Int = 50, reliable: Boolean = false): DataFrame = {
    def materialize(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    // symmetric orientation of an a<b pair list is already duplicate-free,
    // and duplicate edges would not change a min anyway — no distinct
    val p = pairs.select(col(aCol).as("s"), col(bCol).as("d"))
    val edges = materialize(p.union(p.select(col("d").as("s"), col("s").as("d"))))
    // seed with the ONE-HOP min (self + direct neighbors) in a single
    // aggregation: dedup clusters are near-cliques, so most vertices are
    // already final after the seed and the loop is one verification round
    var lbl = materialize(edges.groupBy(col("s").as("id"))
      .agg(min(least(col("s"), col("d"))).as("lbl")))
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      val nbrMin = edges
        .join(lbl.select(col("id").as("d"), col("lbl").as("nlbl")), Seq("d"))
        .groupBy(col("s").as("id")).agg(min(col("nlbl")).as("nbr_min"))
      // the changed-count rides the materialization job as an observe()
      // metric (CollectMetrics fires on the eager checkpoint action —
      // both local and reliable), so each round is ONE job instead of
      // materialize + a second count() pass over the cached state
      val obs = new org.apache.spark.sql.Observation()
      val upd = materialize(lbl.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("lbl"),
          least(col("lbl"), coalesce(col("nbr_min"), col("lbl"))).as("new_lbl"))
        .observe(obs, sum(when(col("new_lbl") < col("lbl"), 1L).otherwise(0L)).as("changed")))
      // The checkpoint action above already ran, so the CollectMetrics
      // result only has to cross the listener bus — poll with a BOUNDED
      // wait rather than obs.get's indefinite block (a materialization
      // path that bypasses withAction would otherwise hang the driver
      // forever), and fall back to one count() on the materialized state
      // if the metric never lands.
      import org.apache.spark.sql.graftshim.ObservationBridge
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var metrics = ObservationBridge.getOrEmpty(obs)
      while (metrics.isEmpty && System.nanoTime() < deadline) {
        Thread.sleep(25); metrics = ObservationBridge.getOrEmpty(obs)
      }
      changed = metrics.get("changed") match {
        case Some(n: Long) => n
        case Some(null)    => 0L // sum over zero rows
        case _ => upd.filter(col("new_lbl") < col("lbl")).count() // metric lost
      }
      lbl = upd.select(col("id"), col("new_lbl").as("lbl"))
      it += 1
    }
    require(changed == 0, s"components did not converge within $maxIters rounds")
    lbl
  }

  /** (idCol, canonical_id) for EVERY row of `docs`: members of a duplicate
    * cluster map to the cluster's min id, singletons map to themselves. */
  def canonicalize(docs: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "a_id", bCol: String = "b_id"): DataFrame = {
    val lbl = labels(pairs, aCol, bCol)
    docs.select(col(idCol))
      .join(lbl.select(col("id").as(idCol), col("lbl")), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("lbl"), col(idCol)).as("canonical_id"))
  }
}
