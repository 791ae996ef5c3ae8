package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.core.{Defaults, RedactionParams, Turn}
import graft.sketch.CountMin
import graft.table.IcebergLite
import graft.text.{Normalize, Redact}

/** A buffered turn inside session state (text retained until session close —
  * the reference holds the whole document open before writing any output,
  * watermark_processor.py:50-166, which fixes detection-state causality:
  * patterns learned anywhere in a session redact every turn of it). */
final case class BufTurn(turn_idx: Int, role: String, text: String,
                         tool: String, tsMs: Long)

/** Per-conv_id session-window state: current session's buffer + count-min
  * sketch over its normalized sentences and shingles. The sketch is stored
  * SPARSELY because state-store bytes are the dominant streaming cost —
  * as exact (keyHash, count) pairs while small (`skKind=1`, 1/depth the
  * entries), as (cell, value) pairs once folded (`skKind=0`, bounded at
  * depth×width) — and rebuilt inside the update function.
  *
  * STATE FORMAT v2 (round-3 ADVICE): adding `learned` in round 3 changed
  * the flatMapGroupsWithState encoder schema, so a checkpoint written by a
  * v1 (round-≤2) build CANNOT be restored — restarts fail with a
  * state-store schema mismatch. Any future field change bumps
  * [[Pipeline.StateFormatVersion]] and carries the same contract: discard
  * the checkpoint (or drain the old stream with AvailableNow, then start a
  * fresh checkpoint from the sink table's epoch offset). */
final case class ConvState(sessionSeq: Long, lastTsMs: Long,
                           buf: List[BufTurn],
                           skIdx: Array[Long], skVal: Array[Long],
                           skTotal: Long, skKind: Int,
                           /** sentences already past the learn threshold —
                             * accreted at add time so session close never
                             * re-normalizes the buffered text (a few short
                             * strings; negligible vs the sketch bytes) */
                           learned: List[String])

/** Output row of the redaction stream. `session_id` and the deterministic
  * lineage the sink appends replace the reference's wall-clock provenance
  * stamp (watermark_processor.py:178-186). */
final case class RedactedTurn(conv_id: String, turn_idx: Int, session_id: Long,
                              role: String, tool: String, ts: Timestamp,
                              text_redacted: String, was_redacted: Boolean)

/** The streaming redaction engine (SURVEY.md §2.8, §7.1.6).
  *
  * Source → watermark on `ts` → `flatMapGroupsWithState` keyed by `conv_id`
  * (session windows via event-time timeout; CMS learns recurring sentences;
  * whole session redacted on close) → exactly-once [[IcebergLite]] sink via
  * `foreachBatch` idempotent epoch commits.
  */
object Pipeline {

  /** Version of the [[ConvState]] streaming-state encoding. Bumped whenever
    * the case-class shape (and therefore the state-store encoder schema)
    * changes; checkpoints written under a different version must be
    * discarded — see the ConvState Scaladoc for the migration contract.
    * v1: rounds 1–2 (no `learned`); v2: round 3+ (learn-at-add).
    * ENFORCED at restore by [[enforceStateFormat]]: the stateful runners
    * stamp fresh checkpoints and reject mismatched/unstamped ones with the
    * migration message instead of Spark's opaque encoder error. */
  val StateFormatVersion = 2

  /** Sentinel conversation id used by test/bench drivers to push the
    * watermark past all real data so tail sessions flush. Filtered before
    * every stateful operator (the filter sits after the watermark node, so
    * the sentinel still advances event time). */
  val FlushConvId = "__flush__"

  def flushTurn(tsMs: Long): Turn =
    Turn(FlushConvId, 0, "system", "", null, new Timestamp(tsMs))

  /** Drop sentinel rows WITHOUT losing their watermark contribution.
    *
    * Subtle: a plain `conv_id =!= flush` predicate is pushed below the
    * `EventTimeWatermark` node by `PushPredicateThroughNonJoin` (it doesn't
    * reference the event-time attribute), so the sentinel row would be
    * pruned at the scan and never advance the watermark. Folding a `ts`
    * reference into one non-splittable OR keeps the filter above the
    * watermark node: the sentinel is seen by the watermark tracker, then
    * dropped before any stateful operator.
    *
    * This leans on optimizer internals — `PlanShapeSpec` asserts the
    * filter-above-watermark shape on the executed plan so a Spark upgrade
    * that re-splits the OR fails the suite instead of silently stalling
    * tail sessions. */
  private def dropFlush(df: Dataset[Turn]): Dataset[Turn] =
    df.filter(col("conv_id") =!= FlushConvId || col("ts").isNull)

  // ---- stateful session redaction -----------------------------------------

  /** Dense working form of [[ConvState]] used inside one update call. */
  private final class Live(var sessionSeq: Long, var lastTsMs: Long,
                           var buf: List[BufTurn], var sk: CountMin,
                           var learned: Set[String])

  private def load(st: ConvState, p: RedactionParams): Live =
    new Live(st.sessionSeq, st.lastTsMs, st.buf,
      CountMin.fromSparse(p.sketchDepth, p.sketchWidth, st.skIdx, st.skVal,
        st.skTotal, st.skKind),
      st.learned.toSet)

  private def store(l: Live): ConvState = {
    val (idx, vals, kind) = CountMin.toSparse(l.sk)
    ConvState(l.sessionSeq, l.lastTsMs, l.buf, idx, vals, l.sk.total, kind,
      l.learned.toList)
  }

  private def emptyLive(p: RedactionParams) =
    new Live(0L, Long.MinValue, Nil, CountMin.empty(p.sketchDepth, p.sketchWidth),
      Set.empty)

  /** CMS key namespaces: one sketch holds both granularities. Sentences key
    * by the string hash of "s:"+sentence; shingles key by their rolling
    * 64-bit hash (Normalize.shingleHashes — never materialized as strings
    * in this hot path). The two hash domains collide with prob 2^-64. */
  private final val SentKey = "s:"

  private def addTurn(l: Live, t: Turn, p: RedactionParams): Unit = {
    // one lowercase pass per turn feeds both sentence and token derivation —
    // string churn is the measured shared-memory-bus cost at high core
    // counts (BENCH.md round-2 scaling analysis)
    val low =
      if (t.text == null) null
      else t.text.toLowerCase(java.util.Locale.ROOT)
    val sentences = Normalize.normalizedSentencesLow(low)
      .filter(_.length >= p.minSentenceLen).distinct
    sentences.foreach { s =>
      // added once per turn → the count IS the distinct-turn count; learn
      // at the exact crossing (sparse-mode counts are exact), so session
      // close never re-normalizes the buffered text
      if (l.sk.addAndCount(SentKey + s) >= p.threshold) l.learned += s
    }
    // R4b: k-token shingles of the normalized text (north star: "count-min
    // frequency sketch over normalized text shingles"), distinct per turn
    val hs = Normalize.shingleHashes(Normalize.tokensLow(low), p.shingleK)
    if (hs.nonEmpty) {
      java.util.Arrays.sort(hs) // distinct-per-turn without a Set alloc
      var i = 0
      var prev = 0L
      while (i < hs.length) {
        if (i == 0 || hs(i) != prev) l.sk.addHash(hs(i), 1L)
        prev = hs(i)
        i += 1
      }
    }
    l.lastTsMs = t.ts.getTime
    l.buf = BufTurn(t.turn_idx, t.role, t.text, t.tool, t.ts.getTime) :: l.buf
  }

  private def closeSession(convId: String, l: Live,
                           p: RedactionParams): Seq[RedactedTurn] = {
    // the learned set accreted at add time (exact crossing detection) —
    // no re-normalization pass over the buffered text here
    val learned = l.learned
    val hotShingle: Long => Boolean =
      h => l.sk.estimateHash(h) >= p.shingleThreshold
    val arr = l.buf.toArray
    java.util.Arrays.sort(arr,
      (a: BufTurn, b: BufTurn) => Integer.compare(a.turn_idx, b.turn_idx))
    val out = Vector.newBuilder[RedactedTurn]
    out.sizeHint(arr.length)
    arr.foreach { b =>
      val red = Redact.redactFull(b.text, b.role, learned, hotShingle, p)
      out += RedactedTurn(convId, b.turn_idx, l.sessionSeq, b.role, b.tool,
        new Timestamp(b.tsMs), red, red != b.text)
    }
    out.result()
  }

  /** The `flatMapGroupsWithState` update function. Pure given (state, input,
    * params) — no wall clock (event-time timeout only), so replay from a
    * checkpoint is deterministic. */
  def updateConv(p: RedactionParams, gapMs: Long)(
      convId: String, turns: Iterator[Turn],
      state: GroupState[ConvState]): Iterator[RedactedTurn] = {
    if (state.hasTimedOut) {
      val out = closeSession(convId, load(state.get, p), p)
      state.remove()
      return out.iterator
    }
    // comparator sort over an array: sortBy on a tuple key allocates a
    // (Long, Int) per turn — pure garbage at millions of turns per batch
    val sorted = turns.toArray
    java.util.Arrays.sort(sorted, (a: Turn, b: Turn) => {
      val c = java.lang.Long.compare(a.ts.getTime, b.ts.getTime)
      if (c != 0) c else Integer.compare(a.turn_idx, b.turn_idx)
    })
    val l = state.getOption.map(load(_, p)).getOrElse(emptyLive(p))
    val out = Seq.newBuilder[RedactedTurn]
    sorted.foreach { t =>
      if (l.buf.nonEmpty && t.ts.getTime - l.lastTsMs > gapMs) {
        // in-stream gap: close the session immediately (exact batch parity,
        // not dependent on timeout granularity)
        out ++= closeSession(convId, l, p)
        l.sessionSeq += 1
        l.buf = Nil
        l.sk = CountMin.empty(p.sketchDepth, p.sketchWidth)
        l.learned = Set.empty
      }
      addTurn(l, t, p)
    }
    if (l.buf.nonEmpty) {
      state.update(store(l))
      // fire once the event-time watermark passes end-of-gap
      val target = l.lastTsMs + gapMs
      val wm = state.getCurrentWatermarkMs()
      state.setTimeoutTimestamp(math.max(target, wm + 1))
    } else state.remove()
    out.result().iterator
  }

  /** Streaming redaction: watermarked source → session state → redacted turns. */
  def redactedStream(turns: Dataset[Turn],
                     p: RedactionParams = RedactionParams(),
                     gapSec: Long = Defaults.SessionGapSec,
                     watermarkDelay: String = "10 seconds"): Dataset[RedactedTurn] = {
    val spark = turns.sparkSession
    import spark.implicits._
    dropFlush(turns.withWatermark("ts", watermarkDelay))
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[ConvState, RedactedTurn](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        updateConv(p, gapSec * 1000L))
  }

  /** A5 streaming form: per-role/per-tool tumbling window stats. */
  def windowStatsStream(turns: Dataset[Turn],
                        watermarkDelay: String = "10 seconds"): DataFrame =
    dropFlush(turns.withWatermark("ts", watermarkDelay))
      .groupBy(window(col("ts"), "1 minute"), col("role"), col("tool"))
      .agg(count(lit(1)).as("turn_count"),
        sum(length(col("text"))).cast("long").as("char_sum"),
        approx_count_distinct(col("conv_id")).as("approx_convs"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("role"), col("tool"),
        col("turn_count"), col("char_sum"), col("approx_convs"))

  /** J1 streaming form: symmetric-hash stream-stream inner join pairing
    * tool calls with responses; watermarks + the time-range predicate bound
    * both state stores. */
  def joinPairsStream(turns: Dataset[Turn],
                      boundSec: Long = Defaults.JoinWindowSec,
                      watermarkDelay: String = "10 seconds"): DataFrame = {
    val base = turns.filter(col("conv_id") =!= FlushConvId)
    val calls = base
      .filter(col("role") === "assistant" && col("tool").isNotNull)
      .select(col("conv_id"), col("turn_idx").as("call_turn_idx"),
        col("tool"), col("ts").as("call_ts"))
      .withWatermark("call_ts", watermarkDelay)
    val resps = base
      .filter(col("role") === "tool" && col("tool").isNotNull)
      .select(col("conv_id").as("r_conv_id"), col("turn_idx").as("resp_turn_idx"),
        col("tool").as("r_tool"), col("ts").as("resp_ts"))
      .withWatermark("resp_ts", watermarkDelay)
    // Only equi keys + the event-time range live in the join condition so
    // Spark can derive state-cleanup bounds for both sides (a non-time
    // predicate inside the condition defeats StreamingJoinHelper's
    // constraint extraction → unbounded state). The turn_idx ordering is a
    // plain post-join filter.
    calls.join(resps,
      col("conv_id") === col("r_conv_id") &&
        col("tool") === col("r_tool") &&
        col("resp_ts") >= col("call_ts") &&
        col("resp_ts") <= col("call_ts") + expr(s"interval $boundSec seconds"),
      "inner")
      .filter(col("resp_turn_idx") > col("call_turn_idx"))
      .select(col("conv_id"), col("call_turn_idx"), col("tool"),
        col("resp_turn_idx"), col("call_ts"), col("resp_ts"))
  }

  // ---- end-to-end query ----------------------------------------------------

  /** Enforce the [[StateFormatVersion]] contract at restore time (round-4
    * VERDICT "What's missing #2" — the contract used to be documentation
    * only, so restoring a v1 checkpoint died in Spark's opaque state-store
    * encoder mismatch instead of the engine's own message).
    *
    * A fresh checkpoint is stamped with the current version
    * (`graft-state-format.json` beside Spark's offset log). On restore the
    * stamp must match exactly; a checkpoint that already has Spark offsets
    * but NO stamp predates versioning (round ≤ 2 builds = state format v1)
    * and is rejected the same way. Stateless queries (no
    * flatMapGroupsWithState) don't call this — their checkpoints carry no
    * state encoder. */
  private[stream] def enforceStateFormat(checkpoint: String,
                                         version: Int = StateFormatVersion): Unit = {
    import java.nio.file.{Files, Paths}
    val dir = Paths.get(checkpoint)
    val stamp = dir.resolve("graft-state-format.json")
    val hasSparkState = Files.exists(dir.resolve("offsets"))
    def fail(found: String): Nothing = throw new IllegalStateException(
      s"checkpoint $checkpoint was written under state format $found but " +
        s"this build runs state format v$version (ConvState encoder schema " +
        "changed). Restoring it would fail inside the state store — " +
        "migrate instead: drain the old stream with the OLD build under " +
        "Trigger.AvailableNow, then start a FRESH checkpoint from the sink " +
        "table's epoch offset (exactly-once commits make the handoff " +
        "seamless), or discard the checkpoint to reprocess.")
    if (Files.exists(stamp)) {
      val found = """"stateFormatVersion"\s*:\s*(\d+)""".r
        .findFirstMatchIn(new String(Files.readAllBytes(stamp), "UTF-8"))
        .map(_.group(1).toInt)
        .getOrElse(throw new IllegalStateException(s"unreadable stamp $stamp"))
      if (found != version) fail(s"v$found")
    } else if (hasSparkState) {
      fail("an unstamped (pre-versioning, v1) layout")
    } else {
      Files.createDirectories(dir)
      Files.write(stamp,
        s"""{"stateFormatVersion":$version}""".getBytes("UTF-8"))
    }
  }

  /** Run the redaction stream from a file source into an [[IcebergLite]]
    * table with exactly-once epoch commits. Resumable from `checkpoint`. */
  def runRedactionToTable(spark: SparkSession, sourceDir: String,
                          tableRoot: String, checkpoint: String,
                          p: RedactionParams = RedactionParams(),
                          numBuckets: Int = 8,
                          maxFilesPerTrigger: Int = 1,
                          trigger: Trigger = Trigger.AvailableNow(),
                          nativeSink: Boolean = true): StreamingQuery = {
    import spark.implicits._
    enforceStateFormat(checkpoint)
    val table = new IcebergLite(tableRoot)
    table.create("conv_id string, turn_idx int, session_id bigint, role string, " +
      "tool string, ts timestamp, text_redacted string, was_redacted boolean",
      numBuckets)
    val src = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Turn]].schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
      .as[Turn]
    // P6/E2: invalid rows never enter session state — they are quarantined
    // by runDeadLetterToTable (continue-and-report, like the reference's
    // per-file failure list). Column predicate: codegen'd, scan-pushable.
    val checked = src.where(graft.operators.Validation.invalidReason.isNull ||
      col("conv_id") === FlushConvId).as[Turn]
    val red = Metrics.observed(redactedStream(checked, p))
    val writer = red.writeStream
      .queryName("redaction-to-table")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
    // Two sinks, one epoch protocol and one physical layout (parity
    // spec-pinned): foreachBatch commits a driver-planned write job per
    // batch; the native DSv2 path ships rows straight from the stateful
    // stage's output tasks into bucket files (Spark-arranged clustering,
    // metadata-only driver commit — measured 1.12x on the pure sink path,
    // see BENCH.md SinkBench). DEFAULT since round 6: native (round-5
    // VERDICT #2 — parity, kill/resume byte-identity and cross-sink
    // content equality were proven in round 5; the opt-in default only
    // existed to keep that round's records path-comparable).
    if (nativeSink)
      writer.format("graft.sources.IcebergLiteSource")
        .option("path", tableRoot)
        .start()
    else
      writer.foreachBatch { (df: Dataset[RedactedTurn], epochId: Long) =>
        table.commitEpoch(df.toDF(), "redaction-to-table", epochId, numBuckets)
        ()
      }.start()
  }

  /** Companion quarantine query (A3/E2 dead-letter rows, not just counts):
    * streams the SAME source, keeps only invalid rows (predicate pushed to
    * the scan — at 100 TB this reads statistics, not the table) and commits
    * them exactly-once to a side table with their reason. */
  def runDeadLetterToTable(spark: SparkSession, sourceDir: String,
                           tableRoot: String, checkpoint: String,
                           numBuckets: Int = 4,
                           trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import spark.implicits._
    val table = new IcebergLite(tableRoot)
    table.create("conv_id string, turn_idx int, role string, tool string, " +
      "ts timestamp, text string, reason string", numBuckets)
    val src = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Turn]].schema)
      .parquet(sourceDir)
    val dead = graft.operators.Validation.deadLetter(
      src.where(col("conv_id") =!= FlushConvId))
    dead.writeStream
      .queryName("dead-letter-to-table")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (df: Dataset[org.apache.spark.sql.Row], epochId: Long) =>
        table.commitEpoch(df.toDF(), "dead-letter-to-table", epochId, numBuckets)
        ()
      }
      .start()
  }
}
