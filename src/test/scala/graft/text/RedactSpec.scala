package graft.text

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Defaults, RedactionParams}

class RedactSpec extends AnyFunSuite with graft.PropHelpers {
  val p: RedactionParams = RedactionParams()

  // R1 — exact literal removal (watermark_processor.py:66-69 semantics)
  test("R1 removes every occurrence, any position") {
    assert(Redact.r1Name("Jean Dupont at start", p) === " at start")
    assert(Redact.r1Name("mid Jean Dupont mid", p) === "mid  mid")
    assert(Redact.r1Name("end Jean Dupont", p) === "end ")
    assert(Redact.r1Name("Jean DupontJean Dupont twice", p) === " twice")
  }

  test("R1 near-miss decoys untouched") {
    assert(Redact.r1Name("jean dupont lowercase", p) === "jean dupont lowercase")
    assert(Redact.r1Name("Jean  Dupont double space", p) === "Jean  Dupont double space")
  }

  // R2 — toggleable footer (empty pattern is a no-op, :72)
  test("R2 disabled toggle is a no-op") {
    val off = p.copy(useFooter = false)
    val s = s"x ${Defaults.FooterPattern} y"
    assert(Redact.r2Footer(s, off) === s)
    assert(Redact.r2Footer(s, p) === "x  y")
  }

  // R3 — prefix + variable tail to sentence boundary (:76-101)
  test("R3 redacts prefix through boundary regardless of tail") {
    assert(Redact.r3DateTail("a. Document non tenu a jour au 2026-01-02. b", p)
      === "a. [REDACTED] b")
    assert(Redact.r3DateTail("x Document non tenu whatever tail no dot", p)
      === "x [REDACTED]")
    // multiple occurrences all redacted
    assert(Redact.r3DateTail("Document non tenu one. mid. Document non tenu two.", p)
      === "[REDACTED] mid. [REDACTED]")
  }

  test("R3 decoy without prefix untouched") {
    val s = "Document tenu a jour au 2026-01-02."
    assert(Redact.r3DateTail(s, p) === s)
  }

  // R5 — marker-scoped blanking, row/structure preserved (:137-155)
  test("R5 only applies to tool role and only from marker") {
    assert(Redact.r5ToolTrace("TRACE: call=search result abc", "tool", p)
      === "[TOOL-TRACE]")
    assert(Redact.r5ToolTrace("prefix TRACE: xyz", "tool", p) === "prefix [TOOL-TRACE]")
    val s = "TRACE: not a tool turn"
    assert(Redact.r5ToolTrace(s, "assistant", p) === s)
  }

  // R4 — learned-sentence removal at '.' granularity
  test("R4 removes only learned sentences, preserves delimiters") {
    val learned = Set(Normalize.normalize("this sentence is definitely boilerplate"))
    val in = "keep me. this   SENTENCE is definitely boilerplate. also keep"
    assert(Redact.r4Learned(in, learned, p)
      === "keep me. [BOILERPLATE]. also keep")
  }

  test("R4 below min length never matches") {
    val short = Normalize.normalize("too short")
    val in = "too short. rest"
    assert(Redact.r4Learned(in, Set(short), p) === in)
  }

  // R4b — shingle-learned span redaction with bounded extension
  def hotSet(shingles: String*): Long => Boolean =
    shingles.map(Normalize.shingleHashOfString).toSet.contains(_)

  test("R4b replaces a maximal run of hot shingles at token boundaries") {
    val hot = hotSet("verification automatique du", "automatique du registre",
      "du registre effectuee", "registre effectuee le")
    val in = "keep this. Verification automatique du registre effectuee le 2026-03-14 sans anomalie."
    // hot run covers tokens "Verification".."le"; the variable tail stays
    assert(Redact.r4Shingles(in, hot, p)
      === "keep this. [RECURRING] 2026-03-14 sans anomalie.")
  }

  test("R4b handles multiple disjoint runs and preserves separators") {
    val hot = hotSet("a b c", "x y z")
    val in = "pre a b c mid x y z post"
    assert(Redact.r4Shingles(in, hot, p)
      === "pre [RECURRING] mid [RECURRING] post")
  }

  test("R4b no-op when nothing is hot or text has < k tokens") {
    val in = "only two"
    assert(Redact.r4Shingles(in, (_: Long) => true, p) eq in)
    val in2 = "one two three four"
    assert(Redact.r4Shingles(in2, (_: Long) => false, p) eq in2)
  }

  test("R4b matches case-insensitively but splices the original text") {
    val hot = hotSet("alpha beta gamma")
    assert(Redact.r4Shingles("say ALPHA Beta gamma tail ok", hot, p)
      === "say [RECURRING] tail ok")
  }

  test("R4b is total and idempotent under a fixed hot set") {
    val hot = hotSet("a b c")
    forAllSeeded(anyText) { (t: String) =>
      val once = Redact.r4Shingles(t, hot, p)
      assert(Redact.r4Shingles(once, hot, p) === once)
    }
  }

  // Composition order R1→R5 (reference applies sequentially, :66-155)
  test("composition order: R1 runs before R3 span match") {
    val in = s"Document non tenu ${Defaults.NamePattern} tail. z"
    // R1 strips the name inside the span; R3 then redacts the span
    assert(Redact.redactBase(in, "user", p) === "[REDACTED] z")
  }

  // Properties (SURVEY.md §5.2.5)
  val anyText: Gen[String] = Gen.frequency(
    8 -> Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.const(Defaults.NamePattern),
      Gen.const(Defaults.FooterPattern), Gen.const(Defaults.DatePrefix),
      Gen.const("."), Gen.const("TRACE:"), Gen.const("")))
      .map(_.mkString(" ")),
    2 -> Gen.asciiStr)
  val anyRole: Gen[String] = Gen.oneOf("user", "assistant", "system", "tool")

  test("redaction is total (never throws) and idempotent") {
    forAllSeeded2(anyText, anyRole) { (t: String, r: String) =>
      val once = Redact.redactBase(t, r, p)
      val twice = Redact.redactBase(once, r, p)
      assert(twice === once)
    }
  }

  test("clean text passes through by reference (dirty-flag fast path)") {
    val clean = "no watermarks here at all"
    assert(Redact.redactBase(clean, "user", p) eq clean)
  }

  test("normalizer is total and SQL-trim compatible") {
    forAllSeeded(Gen.asciiStr) { (s: String) =>
      val n = Normalize.normalize(s)
      assert(n != null)
      assert(!n.startsWith(" ") && !n.endsWith(" "))
    }
    // control chars are NOT stripped by SQL trim — ours must match
    assert(Normalize.normalize("a b") === "a b")
    assert(Normalize.normalize("  a   b  ") === "a b")
  }
}
