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

  /** Card candidate proposal: a MAXIMAL separator-joined digit run —
    * a digit followed by 12+ further digits, each optionally preceded
    * by ONE dash or space. Grouping-agnostic by construction: 4-4-4-4,
    * Amex 4-6-5, Visa 13, contiguous 19 all propose alike (the r11
    * pattern hard-coded 4-4-4-n grouping, so the canonical Amex print
    * form `3782 822463 10005` escaped redaction entirely).
    *
    * Greedy with an UNBOUNDED tail, no alternation, no trailing
    * context: Java and RE2 both take the entire run at the leftmost
    * start, so a candidate is always the maximal run — a PAN embedded
    * in a longer digit run proposes the FULL run (then the 13-19
    * length gate in [[ccCandidatesCol]] disposes), never a prefix the
    * Luhn fold could mis-validate. (A bounded `{12,18}` tail would
    * truncate a longer run at 19 digits and checksum the wrong
    * substring — the boundary bug class ADVICE r11 flagged.)
    * Explicit classes only (the file's RE2-parity dialect). */
  val CcPattern = "[0-9](?:[- ]?[0-9]){12,}"

  /** Luhn checksum over a candidate's digits (separators stripped):
    * every second digit FROM THE RIGHT doubles (minus 9 past 9), and
    * the total must divide by 10. Pure built-ins — an `aggregate` over
    * `sequence(1, n)` with substring/cast arithmetic — so the check
    * stays engine-replayable (DuckDB: `list_sum` over a comprehension,
    * see q_pii_cc's oracle) and inside the no-UDF contract. This is
    * what separates a card number from a 16-digit order id: a random
    * digit run passes only 1 in 10 times. */
  def luhnValid(candidate: Column): Column = {
    val digits = translate(candidate, "- ", "")
    val n = length(digits)
    val total = aggregate(
      sequence(lit(1), n), lit(0),
      (acc, i) => {
        val d = digits.substr(i, lit(1)).cast("int")
        val dbl = d * 2
        acc + when((n - i) % 2 === 1, when(dbl > 9, dbl - 9).otherwise(dbl))
          .otherwise(d)
      })
    total % 10 === 0
  }

  /** Luhn-VALID card candidates in the text, in match order. The regex
    * proposes maximal digit runs ([[CcPattern]]); each run is then
    * disposed in two tiers:
    *
    * TIER 1 — the whole run, when its digit mass is 13-19 (the PAN
    * length range), its group shape is card-like (every separator-
    * delimited group but the last has >= 2 digits — a list of 13+
    * separated single digits is a score list, not a print form, and
    * would otherwise Luhn-pass ~1 in 10 and be destroyed), and the
    * Luhn checksum holds. The run is always checked WHOLE first: no
    * prefix of a longer run is ever Luhn-validated on its own (the
    * r11 boundary-bug class), so a 19-digit print form with 16-valid
    * prefix never redacts its prefix when the full number checks out.
    *
    * TIER 2 — when tier 1 fails (run too long, wrong shape, or Luhn
    * fails), the run may still CONTAIN a PAN fused to adjacent digit
    * tokens by a single separator ("4111 1111 1111 1111 123" — card +
    * CVV; "123 4111 1111 1111 1111"; two contiguous PANs fused by one
    * space; a grouped PAN inside a >19-digit fusion — the r12 recall
    * holes ADVICE flagged). [[windowCandidatesCol]] re-proposes the
    * run's GROUP-BOUNDARY windows — contiguous group subsequences with
    * digit mass 13-19 — under a STRICTER shape gate (every non-last
    * group >= 4 digits, which all real print forms satisfy: 4-4-4-4,
    * Amex 4-6-5, Visa-13's 4-4-4-1), Luhn-gates each, and keeps the
    * leftmost-longest non-overlapping winners. The stricter shape
    * keeps the speculative tier's false-positive surface small: runs
    * of 1-3-digit groups (scores, lottery picks) can never window-
    * match, and the whole-run window re-check can never resurrect a
    * candidate tier 1 rejected (its gates are a superset).
    *
    * Recall bound that REMAINS (documented + spec-pinned): a PAN
    * embedded in a longer CONTIGUOUS digit run ("41111111111111119999")
    * stays — with no separator there is no boundary evidence, and
    * checksumming all substrings would destroy ~1 in 10 long ids. */
  def ccCandidatesCol(text: Column): Column = {
    val runs = regexp_extract_all(text, lit(CcPattern), lit(0))
    flatten(transform(runs, r => {
      val whole = when(
        length(translate(r, "- ", "")).between(13, 19) &&
          groupShapeOk(r) && luhnValid(r),
        array(r))
      coalesce(whole, windowCandidatesCol(r))
    }))
  }

  /** Tier-2 disposal for one maximal run (see [[ccCandidatesCol]]):
    * group-boundary windows, strict shape, Luhn, greedy non-overlap.
    *
    * The run is re-tokenized as `parts` = each digit group WITH its
    * single trailing separator (the last group has none), so a window
    * string is rebuilt by concatenation — original separators intact
    * for the literal replace in [[redactCc]] — with no character-
    * offset arithmetic. Windows span at most 5 groups (4 non-last
    * groups x 4 digits minimum already exceeds the 19-digit mass cap
    * at 5+), so enumeration is O(groups x 5) with O(window) work each:
    * linear in run length, no quadratic blow-up on a pathological
    * kilobyte digit run. Single-group runs skip the tier entirely —
    * their only window IS the whole run tier 1 already rejected. */
  private def windowCandidatesCol(r: Column): Column = {
    val parts = regexp_extract_all(r, lit("[0-9]+[- ]?"), lit(0))
    val m = size(parts)
    val digitLen = (p: Column) => length(translate(p, "- ", ""))
    // (i asc, j desc): per start, the LONGEST valid window is tried
    // first, so the greedy fold below is leftmost-longest.
    val wins = flatten(transform(sequence(lit(1), m), i =>
      filter(
        transform(sequence(least(i + lit(4), m), i, lit(-1)), j => {
          val body = array_join(slice(parts, i, j - i), "")
          val s = concat(body,
            regexp_replace(element_at(parts, j), "[- ]$", ""))
          val shapeOk = !exists(slice(parts, i, j - i),
            p => digitLen(p) < 4)
          when(digitLen(s).between(13, 19) && shapeOk && luhnValid(s),
            struct(i.as("i"), j.as("j"), s.as("s")))
        }),
        w => w.isNotNull)))
    when(m > 1,
      aggregate(wins,
        struct(lit(0).as("last"), typedlit(Seq.empty[String]).as("picked")),
        (acc, w) => when(w.getField("i") > acc.getField("last"),
            struct(w.getField("j").as("last"),
              concat(acc.getField("picked"),
                array(w.getField("s"))).as("picked")))
          .otherwise(acc),
        acc => acc.getField("picked")))
      .otherwise(typedlit(Seq.empty[String]))
  }

  /** True when every separator-delimited group but the last has >= 2
    * digits (contiguous candidates have one group and pass trivially).
    * slice(_, 1, size-1) is the all-but-last prefix; size-1 = 0 for a
    * single group yields an empty slice, and exists over empty is
    * false. */
  private def groupShapeOk(candidate: Column): Column = {
    val groups = split(candidate, "[- ]")
    !exists(slice(groups, lit(1), size(groups) - 1), g => length(g) < 2)
  }

  /** Adds `n_ccs` (Luhn-valid card count) and `outCol` with each valid
    * candidate replaced by `<CC>` — a literal-replace fold over the
    * validated candidates, NOT a blanket regexp_replace, so invalid
    * runs (order ids, timestamps) survive untouched. Caveat: replace()
    * is literal and global, so an (improbable) invalid occurrence of
    * the same digit string as a valid one is redacted with it. */
  def redactCc(df: DataFrame, textCol: String,
               outCol: String = "text_cc_redacted"): DataFrame = {
    val t = col(textCol)
    val cands = ccCandidatesCol(t)
    // "null text -> null count" is EXPLICIT (house convention): via
    // bare size(null) the count silently becomes -1 under the legacy
    // sizeOfNull regime (ansi off + spark.sql.legacy.sizeOfNull=true
    // — a regime the adversarial battery executes), turning undecodable
    // docs into negative card counts.
    df.withColumn("n_ccs",
        when(t.isNull, lit(null).cast("long")).otherwise(size(cands).cast("long")))
      .withColumn(outCol,
        aggregate(cands, t, (acc, c) => replace(acc, c, lit("<CC>"))))
  }

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
