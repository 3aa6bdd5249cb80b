package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Observation

/** private[sql] bridge: Observation.getOrEmpty — the NON-blocking metric
  * read. Components polls it with a bounded deadline instead of
  * Observation.get's indefinite block (a materialization path that never
  * routes through withAction would hang the driver forever there). */
object ObservationBridge {
  def getOrEmpty(o: Observation): Map[String, Any] = o.getOrEmpty
}
