package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Defaults

/** Gap-based sessionization (batch form).
  *
  * The analogue of the reference's document scope — all pages of one PDF are
  * processed as one unit with state dropped at close
  * (/root/reference/mechanisms/watermark_processor.py:50-167); here a
  * "document" is a burst of turns of one `conv_id` separated by ≤ gap.
  *
  * Batch path: window functions (lag + running sum), one shuffle on
  * `conv_id`. The streaming path uses `flatMapGroupsWithState` with
  * event-time timeout (graft.stream) — both are parity-tested.
  */
object Sessions {
  /** Adds `session_id` (0-based per conv_id, bigint).
    *
    * The gap is compared in MICROseconds (`unix_micros`), matching the
    * millisecond comparison of the streaming path (`Pipeline.updateConv`)
    * and the Scala oracle — `unix_timestamp` would truncate to whole
    * seconds and break three-way parity for sub-second timestamps. The lag
    * is materialized once into a column so the Window node evaluates a
    * single lag expression (not one per reference). */
  def withSessionId(df: DataFrame, gapSec: Long = Defaults.SessionGapSec): DataFrame = {
    val byTurn = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    df.withColumn("_prev_us", lag(unix_micros(col("ts")), 1).over(byTurn))
      .withColumn("session_id",
        sum(when(col("_prev_us").isNull ||
          unix_micros(col("ts")) - col("_prev_us") <= gapSec * 1000000L, 0L)
          .otherwise(1L)).over(byTurn))
      .drop("_prev_us")
  }
}
