package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.plans.logical.Sort
import org.apache.spark.sql.graftshim.PlanBridge

/** User-facing API for the per-key top-k operator. Requires the
  * TopKStrategy to be registered in the session (spark.sql.extensions =
  * graft.GraftExtensions). */
object TopK {

  /** Keep the top `k` rows per key group under `order` (use col(...).desc /
    * .asc — include a unique tiebreaker for determinism). Output rows are
    * unordered across keys, unranked — add a window on the (tiny) result if
    * ranks are needed.
    *
    * The catalyst SortOrders are harvested from a throwaway df.sort(...)
    * plan so the Dataset API performs the Column→Expression conversion
    * (building them via the raw column-node bridge leaves lazy unresolved
    * wrappers in the tree). */
  def perKey(df: DataFrame, keyCols: Seq[String], order: Seq[Column], k: Int,
      maxKeysInMemory: Int = 1 << 20): DataFrame = {
    // usable from any session: extraStrategies is the runtime-injectable
    // twin of the extensions-registered strategy
    val exp = df.sparkSession.experimental
    if (!exp.extraStrategies.contains(TopKStrategy)) {
      exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
    }
    val sortNode = PlanBridge.logicalPlan(df.sort(order: _*))
      .collectFirst { case s: Sort => s }
      .getOrElse(throw new IllegalArgumentException("sort plan not found"))
    val keys = keyCols.map(UnresolvedAttribute.quoted)
    PlanBridge.ofRows(df.sparkSession,
      TopKPerKeyNode(keys, sortNode.order, k, sortNode.child, maxKeysInMemory))
  }
}
