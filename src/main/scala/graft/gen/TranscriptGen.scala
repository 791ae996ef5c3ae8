package graft.gen

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.core.{Defaults, Turn}

/** Deterministic pseudo-random mixing (splitmix64 finalizer).
  *
  * All fixture "randomness" is a pure function of `(seed, convId, draw)` —
  * no wall clock, no RNG state. This deliberately fixes the reference's
  * nondeterministic `int(time.time())` ids
  * (/root/reference/mechanisms/watermark_processor.py:47,181) which would
  * break byte-identical replay.
  */
object Mix {
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
  def mix(seed: Long, a: Long, b: Long): Long = mix64(mix64(seed ^ mix64(a)) ^ b)
  /** Non-negative bounded draw. */
  def draw(seed: Long, a: Long, b: Long, mod: Int): Int =
    ((mix(seed, a, b) >>> 1) % mod).toInt
}

/** Generation spec for one synthetic transcripts table. */
final case class GenSpec(
    nConvs: Int,
    seed: Long = 42L,
    /** When set, conv 0 holds roughly half of all turns (hot-key fixture,
      * SURVEY.md §4.2 / §5.2.6). */
    skewed: Boolean = false
)

/** Deterministic synthetic transcript generator (FIXTURES.md §1, §3).
  *
  * Every planted watermark family mirrors one reference mechanism:
  *  - W1 exact name literal        — watermark_processor.py:66-69  (R1)
  *  - W2 exact footer literal      — watermark_processor.py:71-74  (R2)
  *  - W3 prefix + variable tail    — watermark_processor.py:76-101 (R3)
  *  - W4 recurring boilerplate     — watermark_processor.py:103-135 (R4, learned)
  *  - W5 marker-scoped tool trace  — watermark_processor.py:137-155 (R5)
  *  - W6 malformed control chars   — watermark_processor.py:64      (R6)
  * plus an exact-duplicate pool (for dedup operators) and tool-call/response
  * pairs (for the stream-stream join J1).
  *
  * Text is ASCII-only so Spark and DuckDB agree on length/regex/replace
  * semantics in the parity oracle.
  */
object TranscriptGen {
  import Mix._

  val BaseEpochSec = 1767225600L // 2026-01-01T00:00:00Z
  val Tools = Array("search", "calc", "fetch")
  val Roles = Array("user", "assistant", "system")
  val Vocab: Array[String] =
    ("the quick pipeline stream data model table query plan shuffle join " +
      "window agg sketch state commit epoch replay turn text token batch " +
      "filter scan merge sort hash part role value").split(' ')

  /** Exact-duplicate texts (planted across conversations → dedup groups). */
  val DupPool: Array[String] = Array(
    "please see the attached report for the quarterly numbers and sign off",
    "this conversation may be recorded for quality and training purposes",
    "thanks for your patience while we look into the issue on our side",
    "the requested operation completed successfully with no warnings",
    "we could not reproduce the problem with the steps that you provided",
    "your ticket has been escalated to the level two support queue today"
  )

  def boilerplate(seed: Long, convId: Long): String = {
    val k = draw(seed, convId, 3L, 97)
    s"ce service est fourni par operateur $k pour information generale et ne constitue pas un avis"
  }

  private def words(seed: Long, convId: Long, d: Long, n: Int): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(Vocab(draw(seed, convId, d * 131071L + i, Vocab.length)))
      i += 1
    }
    sb.toString
  }

  def nTurnsFor(convId: Long, spec: GenSpec): Int = {
    if (spec.skewed && convId == 0L) spec.nConvs * 25
    else if (draw(spec.seed, convId, 9L, 50) == 0)
      120 + draw(spec.seed, convId, 10L, 200) // long-tail conversations
    else 8 + draw(spec.seed, convId, 1L, 32)
  }

  /** All turns of one conversation. Pure in `(spec.seed, convId)`. */
  def turnsFor(convId: Long, spec: GenSpec): Seq[Turn] = {
    val seed = spec.seed
    val cid = f"conv-$convId%06d"
    val n = nTurnsFor(convId, spec)
    val hasTools = draw(seed, convId, 2L, 2) == 0
    val w4mode = draw(seed, convId, 4L, 10) // <3 planted, ==3 decoy-once
    val w8mode = draw(seed, convId, 11L, 10) // <3 planted
    val boiler = boilerplate(seed, convId)
    val out = new scala.collection.mutable.ArrayBuffer[Turn](n)
    var tsSec = BaseEpochSec + convId * 7L
    var idx = 0
    while (idx < n) {
      if (idx > 0) {
        tsSec += 13L
        if (draw(seed, convId, 2000L + idx, 19) == 0) tsSec += 3600L // session gap
      }
      val h = mix(seed, convId, 1000L + idx)
      val toolSlot = Tools(draw(seed, convId, 8000L + idx / 5, Tools.length))
      val (role, tool) =
        if (hasTools && idx % 5 == 1) ("assistant", toolSlot)
        else if (hasTools && idx % 5 == 2) ("tool", toolSlot)
        else (Roles(((h >>> 3) % 3).toInt.abs), null)

      val text: String =
        if (draw(seed, convId, 3000L + idx, 41) == 0) {
          DupPool(draw(seed, convId, 3100L + idx, DupPool.length))
        } else {
          val sb = new StringBuilder
          if (role == "tool") {
            // W5: marker-scoped payload; ~3/4 of tool turns carry the marker
            if (draw(seed, convId, 9000L + idx, 4) != 0)
              sb.append(Defaults.ToolMarker).append(" call=").append(tool).append(' ')
            sb.append("result ")
          }
          sb.append(words(seed, convId, 100L + idx, 6 + ((h >>> 7) % 12).toInt.abs))
          // W1: exact name literal, varying position, sometimes twice
          val p1 = draw(seed, convId, 4000L + idx, 100)
          if (p1 < 10) {
            val pos = p1 % 3
            if (pos == 0) sb.insert(0, Defaults.NamePattern + " ")
            else sb.append(' ').append(Defaults.NamePattern)
            if (p1 < 3) sb.append(" signed ").append(Defaults.NamePattern)
          }
          sb.append('.')
          // W3: fixed prefix, varying date tail, own sentence
          if (draw(seed, convId, 6000L + idx, 13) == 0) {
            val mm = 1 + draw(seed, convId, 6100L + idx, 9)
            val dd = draw(seed, convId, 6200L + idx, 9)
            sb.append(' ').append(Defaults.DatePrefix)
              .append(s" a jour au 2026-0$mm-1$dd.")
          }
          // W4: recurring boilerplate sentence (to be *learned* by the sketch)
          val w4here = (w4mode < 3 && idx % 3 == 0) || (w4mode == 3 && idx == 4)
          if (w4here) sb.append(' ').append(boiler).append('.')
          // W8: recurring fixed HEAD + variable date tail INSIDE the same
          // sentence — its sentence-level normalization never recurs, so
          // only shingle-level learning (R4b) catches it; the reference's
          // multi-offset n-gram matching is exactly this case
          // (watermark_processor.py:104-109, "quelle que soit la date")
          val w8here = w8mode < 3 && idx % 3 == 1
          if (w8here) {
            val mm = 1 + draw(seed, convId, 8100L + idx, 9)
            val dd = draw(seed, convId, 8200L + idx, 9)
            sb.append(" verification automatique du registre effectuee le ")
              .append(s"2026-0$mm-1$dd sans anomalie.")
          }
          // W2: footer literal appended across many turns
          if (draw(seed, convId, 5000L + idx, 7) == 0)
            sb.append(' ').append(Defaults.FooterPattern)
          // W6: malformed control-char junk; must never break anything
          if (draw(seed, convId, 7000L + idx, 29) == 0)
            sb.append(" junk")
          // W7: pathologically oversized payload (~1/5000 turns) — the
          // validation operator (P6) quarantines these to the dead-letter
          // table; all other queries treat them as ordinary rows
          if (draw(seed, convId, 9500L + idx, 4999) == 0)
            sb.append(' ').append(words(seed, convId, 9600L + idx, 2200))
          sb.toString
        }

      out += Turn(cid, idx, role, text, tool, new Timestamp(tsSec * 1000L))
      idx += 1
    }
    out.toSeq
  }

  /** Distributed dataset of all turns: one `range` partition per slice of
    * conversations, flatMapped — scales to bench sizes without driver memory.
    */
  def dataset(spark: SparkSession, spec: GenSpec): Dataset[Turn] = {
    import spark.implicits._
    val parallelism = math.max(spark.sparkContext.defaultParallelism, 8)
    spark.range(0, spec.nConvs.toLong, 1, parallelism)
      .flatMap(convId => turnsFor(convId, spec))
  }
}
