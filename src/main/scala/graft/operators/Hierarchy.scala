package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recursive hierarchy resolution — the `WITH RECURSIVE` class of query
  * (org rollups, BOM explosion, category trees) expressed the way a
  * distributed engine must: POINTER DOUBLING, not row-at-a-time walking.
  *
  * Each round every node's ancestor pointer jumps to its ancestor's
  * ancestor and the accumulated distance adds, so a chain of depth d
  * resolves in ⌈log₂ d⌉ keyed self-joins instead of d dependent joins —
  * at 100 TB that is the difference between ~5 shuffle rounds and a
  * shuffle per tree level. Every round is one equi-join on the pointer
  * column over a |V|-sized frame; rows that already reached a root stop
  * participating (their pointer misses the non-root join side), so work
  * shrinks as chains resolve. A `localCheckpoint` per round keeps the
  * lineage flat (the same discipline Kmeans/Components use for iteration).
  */
object Hierarchy {

  /** Resolve every node to its root and depth.
    *
    * @param nodes  (key, parent) one row per node; parent NULL marks a root
    * @param rounds doubling rounds; covers depth ≤ 2^rounds (4 rounds =
    *               depth 16 — deeper than any realistic dimension
    *               hierarchy; raise for pathological chains)
    * @return (key, root, depth) — depth 0 for roots
    */
  def resolve(nodes: DataFrame, keyCol: String, parentCol: String,
      rounds: Int = 4): DataFrame = {
    val roots = nodes.filter(col(parentCol).isNull)
      .select(col(keyCol).as("key"), col(keyCol).as("root"), lit(0L).as("depth"))
    // t: unresolved rows — anc = best-known ancestor, dist = hops to it
    var t = nodes.filter(col(parentCol).isNotNull)
      .select(col(keyCol).as("key"), col(parentCol).as("anc"), lit(1L).as("dist"))
    for (_ <- 0 until rounds) {
      val jump = t.select(col("key").as("j_key"), col("anc").as("j_anc"),
        col("dist").as("j_dist"))
      t = t.join(jump, t("anc") === jump("j_key"), "left")
        .select(col("key"),
          coalesce(col("j_anc"), col("anc")).as("anc"),
          (col("dist") + coalesce(col("j_dist"), lit(0L))).as("dist"))
        .localCheckpoint()
    }
    // a pointer that no longer matches any unresolved key is a root
    t.select(col("key"), col("anc").as("root"), col("dist").as("depth"))
      .unionByName(roots)
  }
}
