package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.streaming.operators.stateful.EventTimeWatermarkExec
import org.apache.spark.sql.execution.streaming.runtime.{MemoryStream, StreamingQueryWrapper}
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec
import graft.core.Turn

/** Guard-rail for the flush-sentinel trick (round-2 VERDICT "minor
  * fragility"): `Pipeline.dropFlush` keeps its filter ABOVE the
  * `EventTimeWatermark` node only because the predicate folds in a `ts`
  * reference that `PushPredicateThroughNonJoin` cannot split. That depends
  * on optimizer internals — if a Spark upgrade ever splits the OR and
  * pushes the conv_id half below the watermark, sentinel rows would be
  * pruned at the scan, the watermark would stop advancing, and every tail
  * session would stall SILENTLY. This spec makes that failure loud. */
class PlanShapeSpec extends SparkSpec {

  test("dropFlush filter stays above EventTimeWatermark in the executed plan") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Turn]
    val out = Pipeline.redactedStream(mem.toDS())
    val q = out.writeStream.format("memory").queryName("planshape")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      mem.addData(
        Turn("c1", 0, "user", "hello plan", null, new Timestamp(1767225600000L)),
        Pipeline.flushTurn(1767325600000L))
      q.processAllAvailable()

      val exec = q.asInstanceOf[StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan
      // top-down order: collect() visits parents before children
      val nodes = exec.collect { case n => n }
      val wmIdx = nodes.indexWhere(_.isInstanceOf[EventTimeWatermarkExec])
      assert(wmIdx >= 0, s"no EventTimeWatermarkExec in plan:\n$exec")
      val flushFilterIdx = nodes.indexWhere {
        case f: FilterExec => f.condition.toString.contains(Pipeline.FlushConvId)
        case _ => false
      }
      assert(flushFilterIdx >= 0, s"no flush filter in plan:\n$exec")
      assert(flushFilterIdx < wmIdx,
        s"flush filter was pushed BELOW the watermark node — sentinel rows " +
          s"would no longer advance event time (tail sessions stall):\n$exec")
      // and no OTHER flush-referencing filter may lurk below the watermark
      val below = nodes.drop(wmIdx + 1).exists {
        case f: FilterExec => f.condition.toString.contains(Pipeline.FlushConvId)
        case _ => false
      }
      assert(!below, s"a flush filter was split below the watermark:\n$exec")

      // behavior cross-check: the flush row advanced the watermark (the
      // sentinel itself is dropped, the data row's session closes)
      val rows = spark.table("planshape").select("conv_id").collect()
      assert(rows.map(_.getString(0)).toSet === Set("c1"))
    } finally q.stop()
  }
}
