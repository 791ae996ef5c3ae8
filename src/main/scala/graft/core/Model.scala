package graft.core

import java.sql.Timestamp

/** One transcript turn — the engine's row type.
  *
  * Schema fixed by BASELINE.json `input_hint`:
  * `(conv_id string, turn_idx int32, role string, text string, tool string,
  * ts timestamp)`. A turn is the analogue of one PDF page / content stream in
  * the reference (see /root/reference/mechanisms/watermark_processor.py:54-59);
  * `role`/`tool` are the analogue of the inline color markers the reference
  * keys redaction on (watermark_processor.py:138).
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String, // null unless a tool-call or tool-response turn
    ts: Timestamp
)

/** Redaction job parameters.
  *
  * Mirrors the reference UI parameter surface (/root/reference/ui/app_ui.py:33-40):
  * `name_var` → [[namePattern]], `footer_var` → [[footerPattern]],
  * `use_footer_var` → [[useFooter]] (an empty/disabled footer pattern is a
  * no-op, watermark_processor.py:72). The variable-tail prefix is hardcoded in
  * the reference (watermark_processor.py:79); here it is a parameter.
  */
final case class RedactionParams(
    namePattern: String = Defaults.NamePattern,
    footerPattern: String = Defaults.FooterPattern,
    useFooter: Boolean = true,
    datePrefix: String = Defaults.DatePrefix,
    placeholder: String = Defaults.Placeholder,
    toolMarker: String = Defaults.ToolMarker,
    toolPlaceholder: String = Defaults.ToolPlaceholder,
    // sketch-learned (R4, sentence-granular) knobs
    minSentenceLen: Int = Defaults.MinSentenceLen,
    threshold: Int = Defaults.Threshold,
    learnedPlaceholder: String = Defaults.LearnedPlaceholder,
    // sketch-learned (R4b, shingle-granular) knobs: k-token shingles whose
    // within-session distinct-turn count reaches the threshold mark a
    // recurring pattern even when its sentence-level normalization varies
    // (variable date tails etc. — the reference's multi-offset n-gram pass,
    // watermark_processor.py:104-109); consecutive hot shingles extend to a
    // token-boundary span, replaced as one unit (the R3-style bounded span
    // extension).
    shingleK: Int = Defaults.ShingleK,
    shingleThreshold: Int = Defaults.Threshold,
    shinglePlaceholder: String = Defaults.ShinglePlaceholder,
    // CMS shape: sized for per-session sentence+shingle cardinality
    // (~10^2-10^3 distinct keys). The sketch is stored SPARSELY, so width
    // costs no state bytes — only collision probability: at width 8192 and
    // ~10^3 keys, P(a below-threshold key reads ≥ threshold) ≈ (10^3/8192)^4
    // ≈ 2e-4 per key.
    sketchDepth: Int = 4,
    sketchWidth: Int = 8192
) {
  /** Effective footer literal; "" disables the branch (watermark_processor.py:72). */
  def footer: String = if (useFooter) footerPattern else ""
}

/** Shared constants. All ASCII-only so Spark/DuckDB string semantics
  * (length, regex, replace) agree byte-for-byte in the parity oracle.
  */
object Defaults {
  // W1 — exact user literal (reference: red diagonal name watermark, R1)
  val NamePattern = "Jean Dupont"
  // W2 — exact default literal, toggleable (reference: blue footer, R2)
  val FooterPattern = "DOCUMENT NON APPLICABLE"
  // W3 — fixed prefix, variable tail (reference: "Document non tenu", R3)
  val DatePrefix = "Document non tenu"
  val Placeholder = "[REDACTED]"
  // W5 — marker-scoped redaction (reference: color markers, R5): a tool-turn
  // line starting with this marker is blanked to the placeholder.
  val ToolMarker = "TRACE:"
  val ToolPlaceholder = "[TOOL-TRACE]"
  // W4 — sketch-learned recurring boilerplate (reference: hex n-gram pass, R4)
  val MinSentenceLen = 24 // normalized chars; below this, never "learned"
  val Threshold = 3 // distinct turns within a conv_id session
  val LearnedPlaceholder = "[BOILERPLATE]"
  // W8 — shingle-learned recurring span with a variable tail inside the
  // sentence (R4b; sentence-level normalization never recurs, shingles do)
  val ShingleK = 3
  val ShinglePlaceholder = "[RECURRING]"
  // P6 — input-validation bounds (dead-letter quarantine, A3/E2)
  val MaxTextLen = 8192
  val ValidRoles: Seq[String] = Seq("user", "assistant", "system", "tool")

  val SessionGapSec = 1800L // session window inactivity gap
  val JoinWindowSec = 60L // tool-call -> response pairing bound
}
