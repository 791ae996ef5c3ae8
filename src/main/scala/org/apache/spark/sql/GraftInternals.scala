package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Narrow bridge to ONE `private[sql]` internal the public API does not
  * expose: materializing an already-analyzed [[LogicalPlan]] as a
  * DataFrame. The graft MERGE command carries the resolved source plan of
  * `MERGE INTO ... USING <source>` and must hand the engine a DataFrame —
  * re-rendering an arbitrary resolved plan to SQL text is not total, and
  * collecting it to the driver is exactly the anti-pattern the engine
  * avoids. The package placement is the standard connector technique for
  * reaching `private[sql]` (Delta Lake's classes live under
  * `org.apache.spark.sql.delta` for the same reason); everything else in
  * the engine stays on the public API. */
object GraftInternals {
  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(session.asInstanceOf[classic.SparkSession], plan)

  /** Spark's own catalyst→V1 filter translation (`protected[sql]`): the
    * graft UPDATE rule feeds the translatable WHERE conjuncts to the
    * manifest-pruning predicate. Values come back in the external forms
    * `PrunePredicate` matches on (String; java.sql.Timestamp or
    * java.time.Instant depending on the session's Java-8-datetime
    * setting — both handled). */
  def translateFilter(e: org.apache.spark.sql.catalyst.expressions.Expression,
                      supportNestedPredicatePushdown: Boolean = true)
      : Option[sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown)
}
