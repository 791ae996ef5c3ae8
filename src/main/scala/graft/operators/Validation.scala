package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Defaults

/** Input validation + dead-letter quarantine (SURVEY.md §2.2 P6, §2.4 A3,
  * §2.9 E2).
  *
  * The reference validates inputs before any work starts
  * (/root/reference/ui/app_ui.py:284-307), keeps the per-item failure LIST —
  * not just a count — and reports the top 10 in the final summary
  * (watermark_processor.py:243,275) while processing continues. The engine's
  * analogue: a pure-predicate row split — valid rows continue through the
  * pipeline, invalid rows are quarantined to a dead-letter output with a
  * `reason`, and the summary query is the `ORDER BY ... LIMIT 10` view of
  * that quarantine.
  *
  * All predicates are codegen'd built-ins, so the split is a narrow
  * projection that fuses into the scan (pushdown-friendly at 100 TB).
  */
object Validation {

  /** Null when the turn is valid, else a fixed reason tag. First match wins
    * (a deterministic order, so both engines agree on the reason). */
  def invalidReason: Column =
    when(col("text").isNotNull && length(col("text")) > Defaults.MaxTextLen,
      lit("text_overflow"))
      .when(col("ts").isNull, lit("null_ts"))
      // role.isNull first: !isInCollection(null) is SQL-null, which would
      // skip this branch and let a null-role row through as VALID while the
      // row form rejects it (round-2 ADVICE) — the explicit null check keeps
      // the two forms mirrored.
      .when(col("role").isNull || !col("role").isInCollection(Defaults.ValidRoles),
        lit("bad_role"))
      .otherwise(lit(null).cast("string"))

  /** Rows that continue through the pipeline. */
  def valid(tx: DataFrame): DataFrame = tx.filter(invalidReason.isNull)

  /** Row-level form of [[invalidReason]] for the Scala oracle and typed
    * paths — must mirror the Column form exactly. */
  def isValidTurn(t: graft.core.Turn): Boolean =
    !(t.text != null && t.text.length > Defaults.MaxTextLen) &&
      t.ts != null && Defaults.ValidRoles.contains(t.role)

  /** Quarantined rows with their reason (the failure LIST, A3). */
  def deadLetter(tx: DataFrame): DataFrame =
    tx.withColumn("reason", invalidReason).filter(col("reason").isNotNull)

  /** Final-summary view: the top-10 dead-letter rows in stable order — the
    * analogue of `failed_files[:10]` (watermark_processor.py:275). */
  def deadLetterTop10(tx: DataFrame): DataFrame =
    deadLetter(tx)
      .select(col("conv_id"), col("turn_idx"), col("role"), col("reason"),
        length(col("text")).cast("long").as("text_len"))
      .orderBy(col("conv_id"), col("turn_idx"))
      .limit(10)
}
