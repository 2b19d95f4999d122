package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrubbing pass a training-data
  * pipeline runs before text leaves the ingest tier. Regex-based
  * (emails, phone numbers, IPv4 addresses), all codegen'd built-ins
  * (`regexp_count` / `regexp_replace`) — no UDFs, fully narrow.
  *
  * Pattern dialect: every class is EXPLICIT (no `\s`, no `\d`, `[.]`
  * instead of `\.`) so Java regex and RE2-family engines (the DuckDB
  * oracle) match the identical character sets — see q_pii_redact.
  */
object Pii {

  /** user@host.tld with the usual local-part/host charsets. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"

  /** International-ish dashed phone: +<cc>-<3>-<4>. */
  val PhonePattern = "[+][0-9]{1,3}-[0-9]{3}-[0-9]{4}"

  /** Dotted-quad IPv4 (syntactic — no octet range check). */
  val Ipv4Pattern = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"

  /** Adds n_emails / n_phones / n_ips RAW-TEXT match counts. The three
    * patterns can overlap on raw text (a phone or dotted-quad inside
    * an email's local part is counted by ITS pattern too), so these
    * counts answer "what does each detector see", not "how many
    * placeholders would [[redact]] write" — [[redact]] computes its own
    * cascade-consistent counts. */
  def detect(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", regexp_count(t, lit(EmailPattern)).cast("long"))
      .withColumn("n_phones", regexp_count(t, lit(PhonePattern)).cast("long"))
      .withColumn("n_ips", regexp_count(t, lit(Ipv4Pattern)).cast("long"))
  }

  /** Redacted text column: emails, then phones, then IPs replaced with
    * typed placeholder tokens. Order matters and is fixed — email
    * hosts contain dots that the IPv4 pattern must never see first. */
  def redactCol(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>"),
      Ipv4Pattern, "<IP>")

  /** Adds `outCol` with the redacted text plus counts that agree with
    * the placeholders actually written: each count runs its pattern on
    * the text AFTER the earlier replacements in [[redactCol]]'s cascade
    * (n_phones on the email-redacted text, n_ips on the email+phone-
    * redacted text), so `count of <PHONE> placeholders == n_phones`
    * holds even when a phone-shaped span sits inside an email match
    * that the <EMAIL> replacement consumed. Raw-text detector counts
    * are [[detect]]'s contract, not this one's. */
  def redact(df: DataFrame, textCol: String,
             outCol: String = "text_redacted"): DataFrame = {
    val afterEmail = regexp_replace(col(textCol), EmailPattern, "<EMAIL>")
    val afterPhone = regexp_replace(afterEmail, PhonePattern, "<PHONE>")
    df.withColumn("n_emails",
        regexp_count(col(textCol), lit(EmailPattern)).cast("long"))
      .withColumn("n_phones",
        regexp_count(afterEmail, lit(PhonePattern)).cast("long"))
      .withColumn("n_ips",
        regexp_count(afterPhone, lit(Ipv4Pattern)).cast("long"))
      .withColumn(outCol, regexp_replace(afterPhone, Ipv4Pattern, "<IP>"))
  }
}
