package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper
import org.apache.spark.sql.streaming.StreamingQuery

/** Test-side shim into the streaming engine's `private[sql]` surface
  * (the [[org.apache.spark.sql.graftbridge.Bridge]] pattern): the
  * executed physical plan of a streaming query's most recent
  * micro-batch, for the plan-shape audit — stateful-operator count and
  * exchange count are only observable on the executed
  * IncrementalExecution, never on the unresolved batch plan. */
object StreamBridge {
  def lastExecutedPlan(q: StreamingQuery): SparkPlan =
    q.asInstanceOf[StreamingQueryWrapper].streamingQuery
      .lastExecution.executedPlan
}
