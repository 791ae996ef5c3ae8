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

  /** Spark's OWN parquet task-writer (`private[sql]`), prepared exactly the
    * way `FileFormatWriter` prepares it: the graft DSv2 STREAMING write
    * stages one parquet file per bucket task with it, so streamed epochs
    * use the identical encoder stack (dictionary/RLE, stats, codec) as the
    * driver-side `df.write.parquet` batch path instead of a hand-rolled
    * row writer that would drift. Returns the serializable factory plus
    * the prepared Hadoop conf (schema, codec, timestamp type pinned to
    * TIMESTAMP_MICROS — the engine's canonical on-disk form; see
    * IcebergLite.stageAndPublish). */
  def parquetWriterFactory(spark: SparkSession, schema: types.StructType)
      : (execution.datasources.OutputWriterFactory,
         org.apache.hadoop.conf.Configuration) = {
    val session = spark.asInstanceOf[classic.SparkSession]
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      session.sessionState.newHadoopConf())
    val sqlConf = session.sessionState.conf
    val factory = execution.datasources.parquet.ParquetUtils.prepareWrite(
      sqlConf, job, schema,
      new execution.datasources.parquet.ParquetOptions(
        Map.empty[String, String], sqlConf))
    val conf = job.getConfiguration
    conf.set(internal.SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      "TIMESTAMP_MICROS")
    (factory, conf)
  }
}
