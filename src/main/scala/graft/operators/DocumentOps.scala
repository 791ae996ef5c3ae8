package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the training-data
  * pipeline surface (language id, quality scoring, token counting). All
  * integer-valued outputs so the DuckDB oracle compares exactly (no float
  * drift).
  */
object DocumentOps {

  private def nTokens(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z0-9]+"), lit(0))).cast("long")

  /** Token counting: maximal alphanumeric runs (BPE-ish pre-tokenization). */
  def tokenCount(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), nTokens(col("text")).as("n_tokens"))

  /** Quality scoring: integer char-class tallies + a boolean verdict. */
  def quality(docs: DataFrame): DataFrame = {
    val total = length(col("text")).cast("long")
    val alpha = length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("long")
    val digit = length(regexp_replace(col("text"), "[^0-9]", "")).cast("long")
    val stop = size(regexp_extract_all(lower(col("text")),
      lit("\\b(the|a|and|of|to|in|is|for|on|it)\\b"), lit(0))).cast("long")
    val toks = nTokens(col("text"))
    docs.select(
      col("doc_id"), total.as("total_chars"), alpha.as("alpha_chars"),
      digit.as("digit_chars"), stop.as("stopword_hits"), toks.as("n_tokens"),
      (toks >= 10 && toks <= 5000 && alpha * 10 >= total * 6 && stop >= 1)
        .as("is_quality"))
  }

  private val StopSets: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in|is)\\b",
    "fr" -> "\\b(le|la|les|et|de|un|une|pour)\\b",
    "de" -> "\\b(der|die|das|und|ist|ein)\\b",
    "es" -> "\\b(el|los|las|y|es|un|una|para)\\b")

  /** Language id: stopword-hit argmax with a fixed priority tie-break
    * (en > fr > de > es > und). A deliberately simple, exactly
    * SQL-mirrorable heuristic. */
  def langId(docs: DataFrame): DataFrame = {
    val withHits = StopSets.foldLeft(docs) { case (d, (l, re)) =>
      d.withColumn(s"hits_$l",
        size(regexp_extract_all(lower(col("text")), lit(re), lit(0))).cast("long"))
    }
    val best = greatest(StopSets.map { case (l, _) => col(s"hits_$l") }: _*)
    // foldRight keeps `when(en)` outermost → fixed priority order on ties
    val guess = StopSets.foldRight(lit("und"): Column) { case ((l, _), acc) =>
      when(col(s"hits_$l") === best && best > 0, lit(l)).otherwise(acc)
    }
    withHits.select(
      (col("doc_id") +: guess.as("lang_guess") +:
        StopSets.map { case (l, _) => col(s"hits_$l") }): _*)
  }
}
