package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** private[sql] bridge: free the executor blocks behind a checkpointed
  * Dataset. A (local)checkpoint truncates lineage into a persisted RDD
  * wrapped in a `LogicalRDD` (private[sql]) — `Dataset.unpersist` only
  * touches the SQL plan cache, so without this the blocks live until the
  * session dies. After release the Dataset is NOT recomputable (the
  * checkpoint cut its lineage); callers must also drop their reference —
  * StageCache.release does both. */
object CheckpointBridge {

  /** Unpersist the checkpoint RDD(s) inside df's analyzed plan.
    * @return number of persisted RDDs released (0 = not a checkpoint) */
  def releaseBlocks(df: DataFrame): Int = {
    val rdds = df.queryExecution.analyzed.collect {
      case lr: LogicalRDD => lr.rdd
    }
    rdds.foreach(_.unpersist(blocking = false))
    rdds.size
  }

  /** Storage-level probe for specs: is any checkpoint RDD of df still
    * holding blocks (storage level other than NONE)? */
  def isPersisted(df: DataFrame): Boolean =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRDD => lr.rdd
    }.exists(_.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
}
