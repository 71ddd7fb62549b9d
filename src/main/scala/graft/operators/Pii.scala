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
  * characters in documents.text), so [[synthesizePiiText]] builds
  * deterministic PII-shaped lines from doc_id — the text twin of the
  * m6 pixel formula — and the oracle (`pii1`) replays counts AND the
  * redacted string arithmetically, never running a regex, so every
  * pattern/ordering bug hash-fails. PiiSpec retains the planted edge
  * cases (boundary octets, bare digit runs, already-redacted spans).
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

  /** Deterministic PII-shaped text from doc_id (shared formula with the
    * `pii1` oracle): up to two emails (doc_id % 3 of them), an IPv4
    * when doc_id is odd, a `(NNN) NNN-NNNN` phone when doc_id % 5 != 0,
    * plus fixed non-PII digit bait ("ref 12345 code A1B2") that the
    * phone rule must NOT eat. Built from codegen'd builtins only —
    * `concat_ws` skips the NULL parts identically in Spark and DuckDB,
    * so the oracle reconstructs the exact same string with placeholders
    * substituted and counts computed from the modular arithmetic.
    */
  def synthesizePiiText(ids: DataFrame): DataFrame = {
    val d = col("doc_id")
    val email1 = when(d % 3 >= 1,
      concat(lit("user"), d.cast("string"), lit("@example.com")))
    val email2 = when(d % 3 === 2,
      concat(lit("ops."), (d % 10).cast("string"),
        lit("@mail"), (d % 5).cast("string"), lit(".org")))
    val ip = when(d % 2 === 1,
      concat_ws(".", (d % 256).cast("string"), ((d * 7) % 256).cast("string"),
        ((d * 13) % 256).cast("string"), (d % 100).cast("string")))
    val phone = when(d % 5 =!= 0,
      concat(lit("("), (lit(200) + d % 700).cast("string"), lit(") 555-"),
        lpad((d % 10000).cast("string"), 4, "0")))
    ids.select(d,
      concat_ws(" ", lit("Doc"), d.cast("string"), lit("contact"),
        email1, email2, lit("at"), ip, lit("call"), phone,
        lit("ref 12345 code A1B2")).as("text"))
  }

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
