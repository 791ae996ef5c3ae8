package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec
import graft.core.{RedactionParams, Turn}

/** Late-data accounting (SURVEY.md A3/E2): rows beyond the watermark are
  * dropped AND counted — the continue-and-report contract
  * (watermark_processor.py:260-276). */
class MetricsSpec extends SparkSpec {

  private def t(conv: String, idx: Int, tsSec: Long, text: String = "hello world"): Turn =
    Turn(conv, idx, "user", text, null, new Timestamp(tsSec * 1000L))

  test("late rows are dropped, counted, and the rest stay correct") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Turn]
    val listener = new RedactionMetricsListener
    spark.streams.addListener(listener)
    try {
      val out = Metrics.observed(
        Pipeline.redactedStream(mem.toDS(), RedactionParams(),
          gapSec = 60, watermarkDelay = "10 seconds"))
      val q = out.writeStream.format("memory").queryName("late_t")
        .outputMode(OutputMode.Append())
        .trigger(Trigger.ProcessingTime(0)).start()

      val base = 1767225600L
      // batch 1: two turns, advances max event time to base+100
      mem.addData(t("c1", 0, base), t("c1", 1, base + 100))
      q.processAllAvailable()
      // batch 2: a turn FAR older than watermark (base+100-10) → dropped;
      // plus an on-time turn
      mem.addData(t("c1", 9, base - 3600, "LATE should vanish"),
        t("c1", 2, base + 101))
      q.processAllAvailable()
      // flush: close the session
      mem.addData(Pipeline.flushTurn((base + 100000) * 1000L))
      q.processAllAvailable()
      mem.addData(Pipeline.flushTurn((base + 200000) * 1000L))
      q.processAllAvailable()
      q.processAllAvailable()
      q.stop()

      val rows = spark.table("late_t").select("conv_id", "turn_idx").collect()
        .map(r => (r.getString(0), r.getInt(1))).toSet
      assert(rows === Set(("c1", 0), ("c1", 1), ("c1", 2)),
        s"unexpected emitted rows: $rows")

      val sum = listener.summary
      assert(sum.droppedLateRows === 1L, s"expected 1 dropped late row: $sum")
      assert(sum.emittedRows === 3L, s"observed rows: $sum")
    } finally spark.streams.removeListener(listener)
  }

  test("observed metrics count dirty-flag redactions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Turn]
    val listener = new RedactionMetricsListener
    spark.streams.addListener(listener)
    try {
      val out = Metrics.observed(
        Pipeline.redactedStream(mem.toDS(), RedactionParams(),
          gapSec = 60, watermarkDelay = "1 seconds"))
      val q = out.writeStream.format("memory").queryName("obs_t")
        .outputMode(OutputMode.Append())
        .trigger(Trigger.ProcessingTime(0)).start()
      val base = 1767225600L
      mem.addData(
        t("c1", 0, base, "clean text stays"),
        t("c1", 1, base + 1, s"${graft.core.Defaults.NamePattern} must go"),
        t("c2", 0, base + 2, "also clean"))
      q.processAllAvailable()
      mem.addData(Pipeline.flushTurn((base + 100000) * 1000L))
      q.processAllAvailable()
      mem.addData(Pipeline.flushTurn((base + 200000) * 1000L))
      q.processAllAvailable()
      q.processAllAvailable()
      q.stop()

      val sum = listener.summary
      assert(sum.emittedRows === 3L, s"$sum")
      assert(sum.redactedRows === 1L, s"$sum")
      assert(sum.nEpochs >= 2L)
    } finally spark.streams.removeListener(listener)
  }
}
