package graft.text

import java.sql.Timestamp

import graft.core.{Defaults, RedactionParams, Turn}
import graft.stream.RedactedTurn

/** Single-threaded reference implementation — THE spec (SURVEY.md §5.2).
  *
  * The reference publishes no tests, so semantics are defined by this
  * sequential re-expression of its mechanisms in R1→R5 order; both the
  * distributed batch operators and the streaming engine must reproduce it
  * exactly (per-row invariant: per-turn text equality under stable
  * (conv_id, turn_idx) ordering — BASELINE.json `input_hint`).
  */
object Oracle {

  /** Exact gap-based sessionization of one conversation's turns (sorted by
    * turn_idx), mirroring the reference's one-document-one-unit scope. */
  def sessionize(turns: Seq[Turn], gapSec: Long = Defaults.SessionGapSec): Seq[Seq[Turn]] = {
    val sorted = turns.sortBy(_.turn_idx)
    val out = Seq.newBuilder[Seq[Turn]]
    var cur = List.empty[Turn]
    var lastMs = Long.MinValue
    sorted.foreach { t =>
      if (cur.nonEmpty && t.ts.getTime - lastMs > gapSec * 1000L) {
        out += cur.reverse
        cur = Nil
      }
      cur = t :: cur
      lastMs = t.ts.getTime
    }
    if (cur.nonEmpty) out += cur.reverse
    out.result()
  }

  /** Exact learned set of one session: normalized sentences of length ≥
    * minSentenceLen occurring in ≥ threshold distinct turns. */
  def learnedOf(session: Seq[Turn], p: RedactionParams): Set[String] =
    session
      .flatMap(t => Normalize.normalizedSentences(t.text)
        .filter(_.length >= p.minSentenceLen).distinct.map(_ -> t.turn_idx))
      .groupBy(_._1)
      .collect { case (s, hits) if hits.map(_._2).distinct.size >= p.threshold => s }
      .toSet

  /** Exact hot-shingle-hash set of one session: k-token shingle hashes
    * (Normalize.shingleHashes — the shingle identity shared with streaming
    * and batch redaction) occurring in ≥ shingleThreshold distinct turns
    * (R4b — the exact form of what the streaming CMS estimates). */
  def hotShinglesOf(session: Seq[Turn], p: RedactionParams): Set[Long] =
    session
      .flatMap(t => Normalize.shingleHashes(Normalize.tokens(t.text), p.shingleK)
        .distinct.map(_ -> t.turn_idx))
      .groupBy(_._1)
      .collect { case (h, hits) if hits.map(_._2).distinct.size >= p.shingleThreshold => h }
      .toSet

  /** Full golden output for a set of turns (any order). */
  def redactAll(turns: Seq[Turn],
                p: RedactionParams = RedactionParams(),
                gapSec: Long = Defaults.SessionGapSec): Seq[RedactedTurn] =
    turns.groupBy(_.conv_id).toSeq.sortBy(_._1).flatMap { case (cid, ts) =>
      sessionize(ts, gapSec).zipWithIndex.flatMap { case (session, sid) =>
        val learned = learnedOf(session, p)
        val hotSh = hotShinglesOf(session, p)
        session.map { t =>
          val red = Redact.redactFull(t.text, t.role, learned, hotSh.contains(_), p)
          RedactedTurn(cid, t.turn_idx, sid.toLong, t.role, t.tool,
            new Timestamp(t.ts.getTime), red, red != t.text)
        }
      }
    }
}
