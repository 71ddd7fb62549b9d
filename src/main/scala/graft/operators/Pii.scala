package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** PII detection + redaction — the privacy scrub a training corpus runs
  * before release: emails, IPv4 addresses, and separator-formatted
  * phone numbers are counted on the ORIGINAL text and replaced with
  * stable placeholders, applied email → IP → phone so an
  * already-redacted span is never re-matched by a later pattern.
  *
  * The driver fixture contains no PII-shaped strings (zero '@' or digit
  * characters in documents.text), so an oracle query here would be
  * vacuous — the operator is spec-verified on planted data instead
  * (PiiSpec), the same treatment as the other fixture-limited surfaces
  * (S1 live HTTP, K1 atomic overwrite).
  *
  * Patterns are plain character-class regexes (no lookarounds, no
  * backreferences), the dialect intersection that runs identically
  * under Java regex and RE2-family engines. Scale shape: pure per-row
  * narrow expressions in the scan stage — no shuffle, no UDF.
  */
object Pii {

  val EmailRe: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  val Ipv4Re: String =
    "\\b(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])" +
      "(\\.(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])){3}\\b"

  /** Separator-formatted numbers (555-123-4567, (415) 555-2671,
    * +1 415 555 2671). Bare digit runs are NOT matched — in a text
    * corpus they are overwhelmingly ids/quantities, and a phone rule
    * that eats them redacts half of every markdown table.
    */
  val PhoneRe: String =
    "(\\+[0-9]{1,3}[ -])?(\\([0-9]{3}\\)[ -]?|\\b[0-9]{3}[ -])[0-9]{3}[ -][0-9]{4}\\b"

  /** (doc_id, n_emails, n_ips, n_phones, has_pii, redacted) — counts
    * from the original text, `redacted` with each class replaced by its
    * placeholder.
    */
  def redactPii(docs: DataFrame): DataFrame = {
    val t = col("text")
    docs.select(
      col("doc_id"),
      regexp_count(t, lit(EmailRe)).cast(LongType).as("n_emails"),
      regexp_count(t, lit(Ipv4Re)).cast(LongType).as("n_ips"),
      regexp_count(t, lit(PhoneRe)).cast(LongType).as("n_phones"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailRe, "[EMAIL]"),
          Ipv4Re, "[IP]"),
        PhoneRe, "[PHONE]").as("redacted"))
      .withColumn("has_pii",
        col("n_emails") + col("n_ips") + col("n_phones") > 0L)
  }
}
