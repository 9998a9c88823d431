package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters — the
  * supported way for a library to wrap its own Catalyst expressions as
  * Columns without registering them in a session's FunctionRegistry
  * (classic mode; `classic.ExpressionUtils`). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Free the executor blocks behind an EAGER `localCheckpoint` frame.
    * `Dataset.unpersist` is a no-op for checkpointed frames (they never
    * register with the cache manager), so without this the blocks live
    * until the driver happens to GC the RDD reference — unbounded
    * accumulation for iterative loops that checkpoint per round. Only
    * safe once every consumer of the frame has materialized: a
    * checkpointed frame's data is NOT recomputable. */
  def releaseLocalCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }
}
