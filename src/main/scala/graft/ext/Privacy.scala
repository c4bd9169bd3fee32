package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over text columns — the privacy-hygiene
  * pass a training-data pipeline runs before any text ships to a model
  * (beyond-reference scope, SURVEY.md §2c).
  *
  * Patterns are deliberately restricted to the RE2 ∩ java.util.regex
  * subset (character classes, bounded repetition — no backreferences,
  * no lookaround) so the SAME pattern string runs identically in
  * Spark's codegen'd `regexp_replace`/`regexp_count` and in any
  * RE2-based engine (the q36 oracle replays them in DuckDB verbatim).
  *
  * Scale shape: every operator here is a narrow per-row projection of
  * codegen'd regex expressions — no shuffle, no UDFs; the scan cost is
  * linear in corpus bytes, which is the floor for any redaction pass.
  */
object Privacy {

  /** RFC-5322-ish mailbox (the practical subset). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** 16-digit payment-card number in the Visa shape (leading 4). */
  val CardPattern = "4[0-9]{15}"

  /** North-American phone in the `(NNN) NNN-NNNN` shape. */
  val PhonePattern = "\\([0-9]{3}\\) [0-9]{3}-[0-9]{4}"

  /** Redact all supported PII classes, longest/most-specific first
    * (emails before card numbers before phones — the classes are
    * disjoint by construction, order is fixed for determinism).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        CardPattern, "<CARD>"),
      PhonePattern, "<PHONE>")

  /** Scan: adds `redacted` plus per-class match counts (long). */
  def piiScan(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("redacted", redactPii(col(textCol)))
      .withColumn("n_emails", regexp_count(col(textCol), lit(EmailPattern)).cast("long"))
      .withColumn("n_cards", regexp_count(col(textCol), lit(CardPattern)).cast("long"))
      .withColumn("n_phones", regexp_count(col(textCol), lit(PhonePattern)).cast("long"))

  /** Keep only rows with NO detected PII (the drop-list variant). */
  def dropPii(df: DataFrame, textCol: String): DataFrame =
    df.where(
      regexp_count(col(textCol), lit(EmailPattern)) === 0 &&
        regexp_count(col(textCol), lit(CardPattern)) === 0 &&
        regexp_count(col(textCol), lit(PhonePattern)) === 0)
}
