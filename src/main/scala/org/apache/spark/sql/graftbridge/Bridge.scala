package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge for custom expressions.
  * `ExpressionUtils` is `private[sql]` in Spark 4's classic API, so the
  * two one-line forwarders live in an `org.apache.spark.sql` subpackage
  * (the documented pattern for libraries registering native expressions
  * without a SparkSessionExtensions FunctionRegistry entry). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Block until the listener bus has delivered all queued events.
    * `listenerBus` is `private[spark]`; measurement tools (CurateScale)
    * need a drain barrier so SparkListener counters attribute stage
    * metrics to the step that produced them instead of racing across
    * reset/read boundaries. */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000L)

  /** Whether the session's CacheManager holds no cached plans —
    * `sharedState` is `private[sql]`; the barrier-lifecycle spec
    * asserts this returns to true after
    * [[graft.util.Barriers.releaseAll]]. */
  def cacheManagerIsEmpty(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
