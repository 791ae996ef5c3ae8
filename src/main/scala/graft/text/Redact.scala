package graft.text

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.RedactionParams

/** The redaction operator family (SURVEY.md §2.3, R1–R5).
  *
  * Semantics are re-expressed from the reference's per-content-stream rewrites
  * (/root/reference/mechanisms/watermark_processor.py:66-155), applied in the
  * reference's fixed order R1 → R2 → R3 → (R4) → R5 — later mechanisms see
  * earlier output (watermark_processor.py:66-155 operates on one mutable
  * buffer).
  *
  * Every rule exists in two parity-tested forms:
  *  - a pure Scala function (the single-threaded oracle — the spec; also used
  *    inside `flatMapGroupsWithState`), total, never throws (R6 tolerance,
  *    watermark_processor.py:64);
  *  - a Catalyst [[Column]] expression built from codegen'd built-ins
  *    (`replace` / `regexp_replace` / `when`) — the distributed fast path;
  *    no UDF, stays inside whole-stage codegen.
  */
object Redact {

  /** R3 — prefix-anchored variable-tail span: from the prefix to the nearest
    * sentence boundary ('.', consumed if present). Mirrors the bounded
    * forward-scan for end markers at watermark_processor.py:85-101, with
    * '.' playing the role of the `Tj`/`ET`/`)` end markers.
    */
  def dateTailRegex(prefix: String): String = Pattern.quote(prefix) + "[^.]*\\.?"

  /** R5 — marker-scoped span: the marker and the rest of its line. Mirrors
    * the color-marker-scoped `BT..ET` block blanking at
    * watermark_processor.py:137-155.
    */
  def toolTraceRegex(marker: String): String = Pattern.quote(marker) + "[^\n]*"

  // ---- pure Scala (oracle / state-side) ------------------------------------

  // LITERAL-COUNT ENVELOPE (round-3 VERDICT #7). R1/R2 apply one
  // String.replace pass per literal — O(literals × text). This is the
  // supported envelope: a handful of literals (the parameter surface
  // carries exactly two, namePattern + footer), where per-pass setup is
  // cheaper than any automaton and the Column forms stay codegen'd
  // built-ins. A single-pass multi-literal matcher (Aho-Corasick) is NOT a
  // drop-in replacement above that envelope: sequential passes are
  // SEMANTIC — removing literal A can create a new occurrence of B
  // spanning the seam, which pass 2 removes but a one-pass automaton over
  // the original text cannot see (the reference applies rules to one
  // mutable buffer in order, watermark_processor.py:66-155). Growing the
  // parameter surface to a literal LIST therefore means either (a) keeping
  // per-literal passes and accepting O(L·n), or (b) defining list
  // semantics as simultaneous-match (one automaton pass, no seam
  // rescanning) and versioning the operator contract accordingly.
  def r1Name(text: String, p: RedactionParams): String =
    if (p.namePattern.isEmpty) text else text.replace(p.namePattern, "")

  def r2Footer(text: String, p: RedactionParams): String =
    if (p.footer.isEmpty) text else text.replace(p.footer, "")

  def r3DateTail(text: String, p: RedactionParams): String =
    if (p.datePrefix.isEmpty || !text.contains(p.datePrefix)) text
    else
      text.replaceAll(dateTailRegex(p.datePrefix), Matcher.quoteReplacement(p.placeholder))

  def r5ToolTrace(text: String, role: String, p: RedactionParams): String =
    if (role != "tool" || !text.contains(p.toolMarker)) text
    else
      text.replaceAll(toolTraceRegex(p.toolMarker), Matcher.quoteReplacement(p.toolPlaceholder))

  /** R1+R2+R3+R5 (everything except the sketch-learned R4). Total. */
  def redactBase(text: String, role: String, p: RedactionParams): String = {
    if (text == null) return null
    r5ToolTrace(r3DateTail(r2Footer(r1Name(text, p), p), p), role, p)
  }

  /** R4 — remove sentences whose normalized form is in the learned set
    * (sketch-detected recurring boilerplate; the generalization of the
    * reference's hex n-gram pass, watermark_processor.py:103-135). Sentence
    * granularity = '.'-delimited spans; the delimiter is preserved (the
    * reference keeps `()` / `BT ET` delimiters at :98,154).
    */
  def r4Learned(text: String, learned: Set[String], p: RedactionParams): String = {
    if (text == null || learned.isEmpty || text.indexOf('.') < 0) return text
    val parts = text.split("\\.", -1)
    var changed = false
    var i = 0
    while (i < parts.length) {
      val n = Normalize.normalize(parts(i))
      if (n.length >= p.minSentenceLen && learned.contains(n)) {
        parts(i) = " " + p.learnedPlaceholder
        changed = true
      }
      i += 1
    }
    if (changed) parts.mkString(".") else text
  }

  /** R4b — shingle-learned span redaction with bounded extension: find the
    * k-token shingles of the text whose lowercased form `isHot` (i.e. the
    * session sketch counted them in ≥ shingleThreshold distinct turns),
    * merge runs of CONSECUTIVE hot shingles, and replace each run's covering
    * character span — from the first token's start to the last token's end,
    * token boundaries only — with the placeholder. This is the analogue of
    * the reference's multi-offset hex n-gram pass with bounded span
    * extraction (watermark_processor.py:103-135): a recurring pattern whose
    * sentence-level normalization varies (a date tail inside the sentence)
    * is still caught, and only the recurring span is blanked, not the tail.
    */
  def r4Shingles(text: String, isHot: Long => Boolean, p: RedactionParams): String = {
    if (text == null) return null
    val k = p.shingleK
    val spans = Normalize.tokenSpans(text)
    if (spans.length < k) return text
    val toks = spans.map(s =>
      text.substring(s._1, s._2).toLowerCase(java.util.Locale.ROOT))
    val hashes = Normalize.shingleHashes(toks, k)
    val nSh = hashes.length
    var any = false
    val hot = new Array[Boolean](nSh)
    var i = 0
    while (i < nSh) {
      hot(i) = isHot(hashes(i))
      if (hot(i)) any = true
      i += 1
    }
    if (!any) return text
    val out = new java.lang.StringBuilder
    var pos = 0
    i = 0
    while (i < nSh) {
      if (hot(i)) {
        var j = i
        while (j + 1 < nSh && hot(j + 1)) j += 1
        val startChar = spans(i)._1
        val endChar = spans(j + k - 1)._2
        out.append(text, pos, startChar).append(p.shinglePlaceholder)
        pos = endChar
        i = j + k // next shingle fully after the replaced run
      } else i += 1
    }
    out.append(text, pos, text.length)
    out.toString
  }

  /** Full redaction R1→R2→R3→R4→R4b→R5 given the learned sentence set and
    * the hot-shingle-HASH predicate (exact set membership for the
    * batch/oracle forms; a CMS threshold test in streaming state). */
  def redactFull(text: String, role: String, learned: Set[String],
                 hotShingle: Long => Boolean, p: RedactionParams): String = {
    if (text == null) return null
    r5ToolTrace(
      r4Shingles(
        r4Learned(r3DateTail(r2Footer(r1Name(text, p), p), p), learned, p),
        hotShingle, p),
      role, p)
  }

  /** Sentence-level-only form (no shingle learning). */
  def redactFull(text: String, role: String, learned: Set[String], p: RedactionParams): String =
    redactFull(text, role, learned, (_: Long) => false, p)

  // ---- Catalyst column expressions (distributed fast path) ------------------

  /** Column form of [[redactBase]] — identical semantics, pure built-ins. */
  def redactBaseCol(text: Column, role: Column, p: RedactionParams): Column = {
    val s1 =
      if (p.namePattern.isEmpty) text
      else replace(text, lit(p.namePattern), lit(""))
    val s2 =
      if (p.footer.isEmpty) s1
      else replace(s1, lit(p.footer), lit(""))
    val s3 =
      if (p.datePrefix.isEmpty) s2
      else regexp_replace(s2, dateTailRegex(p.datePrefix), Matcher.quoteReplacement(p.placeholder))
    when(role === lit("tool"),
      regexp_replace(s3, toolTraceRegex(p.toolMarker), Matcher.quoteReplacement(p.toolPlaceholder)))
      .otherwise(s3)
  }
}
