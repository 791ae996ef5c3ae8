package graft.text

import java.util.Locale
import java.util.regex.Pattern

/** Lossy-tolerant normalization (SURVEY.md §2.3 R6).
  *
  * Detection runs on a normalized view while redaction applies to the
  * original text — the split the reference makes between
  * `content.decode('utf-8', errors='ignore')` for matching and byte-level
  * rewrites (/root/reference/mechanisms/watermark_processor.py:64,68).
  *
  * Semantics are deliberately restricted to constructs with byte-identical
  * DuckDB equivalents (`trim(regexp_replace(lower(s), '\s+', ' ', 'g'))`)
  * so the SQL oracle can mirror them:
  *  - lowercase with Locale.ROOT (ASCII-stable);
  *  - collapse whitespace runs to one space;
  *  - strip leading/trailing *spaces only* (SQL `trim` semantics — NOT
  *    `String.trim`, which would also strip control chars and diverge).
  * Total: never throws on malformed/control-char input.
  */
object Normalize {
  private val Ws = Pattern.compile("\\s+")

  def normalize(s: String): String = {
    if (s == null) return null
    val collapsed = Ws.matcher(s.toLowerCase(Locale.ROOT)).replaceAll(" ")
    stripSpaces(collapsed)
  }

  /** SQL-`trim`-equivalent: removes U+0020 only. */
  def stripSpaces(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  /** '.'-delimited sentence spans (delimiter excluded), normalized.
    * Keeps empty trailing pieces out; pure, total.
    */
  def normalizedSentences(text: String): Seq[String] = {
    if (text == null || text.isEmpty) return Nil
    text.split("\\.", -1).toSeq.map(normalize).filter(_.nonEmpty)
  }

  /** [[normalizedSentences]] over text that is ALREADY lowercased — the
    * streaming hot path lowercases each turn once and derives sentences AND
    * tokens from that single pass ('.' is unaffected by case mapping, so
    * lower-then-split equals split-then-lower). */
  def normalizedSentencesLow(low: String): Seq[String] = {
    if (low == null || low.isEmpty) return Nil
    low.split("\\.", -1).toSeq
      .map(piece => stripSpaces(Ws.matcher(piece).replaceAll(" ")))
      .filter(_.nonEmpty)
  }

  /** Word tokens for shingling: maximal `[a-z0-9]+` runs of the normalized
    * text (DuckDB mirror: `regexp_extract_all(lower(s), '[a-z0-9]+')`).
    */
  private val Tok = Pattern.compile("[a-z0-9]+")
  def tokens(s: String): IndexedSeq[String] = {
    if (s == null) return Vector.empty
    tokensLow(s.toLowerCase(Locale.ROOT))
  }

  /** [[tokens]] over already-lowercased text (single-lowercase hot path). */
  def tokensLow(low: String): IndexedSeq[String] = {
    if (low == null) return Vector.empty
    val m = Tok.matcher(low)
    val out = Vector.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** k-token shingles joined by single spaces. */
  def shingles(s: String, k: Int): IndexedSeq[String] = {
    val t = tokens(s)
    if (t.length < k) Vector.empty
    else (0 to t.length - k).map(i => t.slice(i, i + k).mkString(" "))
  }

  /** Order-sensitive 64-bit shingle hashes computed WITHOUT materializing
    * shingle strings (the streaming hot path allocates nothing per
    * shingle): each token is murmur-hashed once, then a k-window rolling
    * combine of mixes produces one hash per shingle position. This is the
    * shingle IDENTITY for all redaction paths (streaming CMS, Scala
    * oracle, batch redactFull) — equivalent to keying by the joined
    * shingle string modulo 2^-64 collisions. The SQL-facing detection
    * queries (q22) keep the string form for DuckDB parity. */
  private val TokSeed = 0x7351a4
  def tokenHash(t: String): Long =
    graft.gen.Mix.mix64(
      scala.util.hashing.MurmurHash3.stringHash(t, TokSeed).toLong)

  def shingleHashes(tokens: IndexedSeq[String], k: Int): Array[Long] = {
    if (tokens.length < k) return Array.emptyLongArray
    val th = new Array[Long](tokens.length)
    var i = 0
    while (i < tokens.length) { th(i) = tokenHash(tokens(i)); i += 1 }
    val out = new Array[Long](tokens.length - k + 1)
    i = 0
    while (i < out.length) {
      var h = 0x9e3779b97f4a7c15L
      var j = i
      while (j < i + k) { h = graft.gen.Mix.mix64(h ^ th(j)); j += 1 }
      out(i) = h
      i += 1
    }
    out
  }

  /** Hash of one shingle given as its joined string form ("tok tok tok") —
    * the bridge from string-form detection output to hash-form redaction.
    * Must agree with [[shingleHashes]] position-for-position. */
  def shingleHashOfString(s: String): Long = {
    val t = tokens(s)
    var h = 0x9e3779b97f4a7c15L
    var j = 0
    while (j < t.length) { h = graft.gen.Mix.mix64(h ^ tokenHash(t(j))); j += 1 }
    h
  }

  /** Token character spans `[start, end)` in the ORIGINAL text: maximal
    * `[A-Za-z0-9]+` runs. This is the offset map that lets detection run on
    * the normalized view while redaction splices the original (R6 — the
    * reference decodes lossily for matching but rewrites the raw bytes,
    * watermark_processor.py:64,68). For ASCII input the spans coincide with
    * [[tokens]] of the lowercased text, token for token. */
  private val TokAny = Pattern.compile("[A-Za-z0-9]+")
  def tokenSpans(s: String): IndexedSeq[(Int, Int)] = {
    if (s == null) return Vector.empty
    val m = TokAny.matcher(s)
    val out = Vector.newBuilder[(Int, Int)]
    while (m.find()) out += ((m.start, m.end))
    out.result()
  }
}
