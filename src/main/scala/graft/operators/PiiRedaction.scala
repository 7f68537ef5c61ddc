package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * PII redaction for training corpora: replace e-mail addresses, phone
 * numbers, and IPv4 addresses with stable placeholder tokens (the Dolma /
 * FineWeb-style preprocessing step). Pure `regexp_replace` compositions —
 * codegen'd, narrow, pushdown-friendly; no shuffle, no UDF.
 *
 * The patterns deliberately stick to the regex subset with identical
 * semantics in Java regex (Spark) and RE2 (DuckDB oracle): character
 * classes, bounded repetition, alternation — no backreferences or
 * lookaround.
 */
object PiiRedaction {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  val EmailToken = "<EMAIL>"
  val PhoneToken = "<PHONE>"
  val IpToken = "<IP>"

  /** Redacted text column. Order matters: e-mails first (their local
    * parts can contain digits that would half-match the looser numeric
    * patterns), then phones, then IPv4. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, EmailToken),
        PhoneRe, PhoneToken),
      Ipv4Re, IpToken)

  /** Count of PII matches of one pattern. */
  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /**
   * Redaction projection: (idCol, n_emails, n_phones, n_ips, redacted).
   * Counts are computed on the pre-redaction text; `redacted` applies all
   * three patterns.
   */
  def redactDocuments(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      countMatches(t, EmailRe).as("n_emails"),
      countMatches(regexp_replace(t, EmailRe, EmailToken), PhoneRe).as("n_phones"),
      countMatches(regexp_replace(regexp_replace(t, EmailRe, EmailToken), PhoneRe, PhoneToken), Ipv4Re).as("n_ips"),
      redact(t).as("redacted"))
  }
}
