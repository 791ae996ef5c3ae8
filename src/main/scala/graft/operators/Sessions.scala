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
  /** Adds `session_id` (0-based per conv_id, bigint). */
  def withSessionId(df: DataFrame, gapSec: Long = Defaults.SessionGapSec): DataFrame = {
    val byTurn = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    val gap = unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(byTurn))
    val isNew = when(gap.isNull || gap <= gapSec, 0L).otherwise(1L)
    df.withColumn("session_id", sum(isNew).over(byTurn))
  }
}
