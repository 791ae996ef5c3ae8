package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.gen.Fixtures
import graft.operators.{DocumentOps, TranscriptOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Transcript queries run over the deterministic synthetic transcripts table
  * (BASELINE.json `input_hint`), materialized under /root/repo/data by
  * [[Fixtures]]; the DuckDB oracle reads the identical parquet files via
  * `read_parquet(...)`. Document queries run over the driver-provided
  * `documents` table in the sf directory.
  */
object SparkEntry {

  /** Flagship: full base redaction over sf0.001 transcripts. */
  def entry(spark: SparkSession): DataFrame =
    TranscriptOps.redactBase(Fixtures.transcripts(spark, "/root/testdata/sf0.001"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_redact" -> ((s, dir) =>
      TranscriptOps.redactBase(Fixtures.transcripts(s, dir))),
    "q2_detect" -> ((s, dir) =>
      TranscriptOps.detectRecurring(Fixtures.transcripts(s, dir))),
    "q3_window_stats" -> ((s, dir) =>
      TranscriptOps.windowStats(Fixtures.transcripts(s, dir))),
    "q4_join_pairs" -> ((s, dir) =>
      TranscriptOps.joinPairs(Fixtures.transcripts(s, dir))),
    "q5_session_stats" -> ((s, dir) =>
      TranscriptOps.sessionStats(Fixtures.transcripts(s, dir))),
    "q6_skew_agg" -> ((s, dir) =>
      TranscriptOps.skewAgg(Fixtures.transcriptsSkew(s, dir))),
    "q7_dedup_exact" -> ((s, dir) =>
      TranscriptOps.dedupExact(Fixtures.transcripts(s, dir))),
    "q8_token_count" -> ((s, dir) =>
      DocumentOps.tokenCount(Fixtures.documents(s, dir))),
    "q9_quality" -> ((s, dir) =>
      DocumentOps.quality(Fixtures.documents(s, dir))),
    "q10_lang_id" -> ((s, dir) =>
      DocumentOps.langId(Fixtures.documents(s, dir)))
  )

  // The driver verifies at sf0.01, so oracle SQL references the sf0.01
  // synthetic parquet by absolute path (same files Spark read).
  private val T = "read_parquet('/root/repo/data/transcripts_sf0.01/*.parquet')"
  private val TSkew = "read_parquet('/root/repo/data/transcripts_skew_sf0.01/*.parquet')"

  // Shared CTE: gap-based sessionization (mirror of operators.Sessions).
  private def sessionCte(src: String): String =
    s"""WITH g AS (
       |  SELECT conv_id, turn_idx, text, ts,
       |         epoch(ts) - epoch(lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx)) AS gap
       |  FROM $src
       |), s AS (
       |  SELECT conv_id, turn_idx, text, ts,
       |         CAST(sum(CASE WHEN gap IS NULL OR gap <= 1800 THEN 0 ELSE 1 END)
       |              OVER (PARTITION BY conv_id ORDER BY turn_idx) AS BIGINT) AS session_id
       |  FROM g
       |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q1_redact" ->
      s"""SELECT conv_id, turn_idx,
         |  CASE WHEN role = 'tool'
         |       THEN regexp_replace(s3, 'TRACE:[^\\n]*', '[TOOL-TRACE]', 'g')
         |       ELSE s3 END AS text_redacted
         |FROM (
         |  SELECT conv_id, turn_idx, role,
         |    regexp_replace(
         |      replace(replace(text, 'Jean Dupont', ''), 'DOCUMENT NON APPLICABLE', ''),
         |      'Document non tenu[^.]*\\.?', '[REDACTED]', 'g') AS s3
         |  FROM $T)""".stripMargin,
    "q2_detect" ->
      s"""${sessionCte(T)},
         |x AS (
         |  SELECT conv_id, session_id, turn_idx,
         |         trim(regexp_replace(lower(u.piece), '\\s+', ' ', 'g')) AS sentence
         |  FROM s, unnest(string_split(text, '.')) AS u(piece)
         |)
         |SELECT conv_id, session_id, sentence,
         |       count(DISTINCT turn_idx) AS n_turns
         |FROM x WHERE length(sentence) >= 24
         |GROUP BY 1, 2, 3 HAVING count(DISTINCT turn_idx) >= 3""".stripMargin,
    "q3_window_stats" ->
      s"""SELECT date_trunc('minute', ts) AS window_start, role, tool,
         |       count(*) AS turn_count,
         |       CAST(sum(length(text)) AS BIGINT) AS char_sum,
         |       count(DISTINCT conv_id) AS n_convs
         |FROM $T GROUP BY 1, 2, 3""".stripMargin,
    "q4_join_pairs" ->
      s"""SELECT c.conv_id, c.turn_idx AS call_turn_idx, c.tool,
         |       min(r.turn_idx) AS resp_turn_idx
         |FROM $T c JOIN $T r
         |  ON c.conv_id = r.conv_id AND c.tool = r.tool
         | AND r.turn_idx > c.turn_idx
         | AND r.ts >= c.ts AND r.ts <= c.ts + INTERVAL 60 SECOND
         |WHERE c.role = 'assistant' AND c.tool IS NOT NULL AND r.role = 'tool'
         |GROUP BY 1, 2, 3""".stripMargin,
    "q5_session_stats" ->
      s"""${sessionCte(T)}
         |SELECT conv_id, count(DISTINCT session_id) AS n_sessions,
         |       count(*) AS n_turns
         |FROM s GROUP BY 1""".stripMargin,
    "q6_skew_agg" ->
      s"""SELECT conv_id, count(*) AS n_turns,
         |       CAST(sum(length(text)) AS BIGINT) AS char_sum
         |FROM $TSkew GROUP BY 1""".stripMargin,
    "q7_dedup_exact" ->
      s"""SELECT md5(text) AS text_hash, count(*) AS n_copies,
         |       count(DISTINCT conv_id) AS n_convs, min(conv_id) AS first_conv
         |FROM $T GROUP BY 1 HAVING count(*) > 1""".stripMargin,
    "q8_token_count" ->
      """SELECT doc_id,
        |       CAST(length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens
        |FROM documents""".stripMargin,
    "q9_quality" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS total_chars,
        |  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS alpha_chars,
        |  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS digit_chars,
        |  CAST(length(regexp_extract_all(lower(text), '\b(the|a|and|of|to|in|is|for|on|it)\b')) AS BIGINT) AS stopword_hits,
        |  CAST(length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
        |  (length(regexp_extract_all(text, '[A-Za-z0-9]+')) BETWEEN 10 AND 5000
        |   AND length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 10 >= length(text) * 6
        |   AND length(regexp_extract_all(lower(text), '\b(the|a|and|of|to|in|is|for|on|it)\b')) >= 1) AS is_quality
        |FROM documents""".stripMargin,
    "q10_lang_id" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CAST(length(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is)\b')) AS BIGINT) AS hits_en,
        |    CAST(length(regexp_extract_all(lower(text), '\b(le|la|les|et|de|un|une|pour)\b')) AS BIGINT) AS hits_fr,
        |    CAST(length(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|ein)\b')) AS BIGINT) AS hits_de,
        |    CAST(length(regexp_extract_all(lower(text), '\b(el|los|las|y|es|un|una|para)\b')) AS BIGINT) AS hits_es
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN hits_en = greatest(hits_en, hits_fr, hits_de, hits_es) AND greatest(hits_en, hits_fr, hits_de, hits_es) > 0 THEN 'en'
        |       WHEN hits_fr = greatest(hits_en, hits_fr, hits_de, hits_es) AND greatest(hits_en, hits_fr, hits_de, hits_es) > 0 THEN 'fr'
        |       WHEN hits_de = greatest(hits_en, hits_fr, hits_de, hits_es) AND greatest(hits_en, hits_fr, hits_de, hits_es) > 0 THEN 'de'
        |       WHEN hits_es = greatest(hits_en, hits_fr, hits_de, hits_es) AND greatest(hits_en, hits_fr, hits_de, hits_es) > 0 THEN 'es'
        |       ELSE 'und' END AS lang_guess,
        |  hits_en, hits_fr, hits_de, hits_es
        |FROM h""".stripMargin
  )
}
