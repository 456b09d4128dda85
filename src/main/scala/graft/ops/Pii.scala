package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data scrubbing: count and
  * mask emails, IPv4 addresses, and phone-shaped numbers before text
  * reaches a training corpus.
  *
  * Pure per-row regex map work — codegen'd builtins
  * (regexp_extract_all / regexp_replace), no UDFs, no shuffle; at
  * 100 TB this rides the scan like the other TextAnalysis kernels.
  *
  * The patterns are deliberately restricted to constructs Java regex
  * and RE2 (the DuckDB oracle engine) interpret identically — ASCII
  * classes, `\b`, bounded repetition — so the oracle can replicate the
  * exact match set. Redaction applies the patterns in a FIXED order
  * (email → IPv4 → IBAN → SSN → card → phone): email bodies may
  * contain dots and digits that the later patterns would otherwise
  * carve up, and each digit-bearing shape goes before any shorter
  * shape that could bite a piece out of it, so the order is part of
  * the operator's contract (PiiSpec pins it).
  */
object Pii {

  /** user@host.tld with the common local-part charset. */
  val emailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (unvalidated octets — a scrubber over-matches
    * rather than leaks; 999.0.0.1 is redacted too). */
  val ipv4Pattern: String =
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NANP phone shapes, leftmost-first alternation (Java and RE2
    * agree on leftmost-first here; RE2 has no lookbehind, so the
    * boundary anchors are spelled per-alternative):
    *  1. parenthesized area code   — `(555) 123-4567`
    *  2. 10-digit with optional +1 — `555-123-4567`, `+1 555.123.4567`
    *  3. bare 7-digit              — `555-0199`
    * The 10-digit alternative is tried before the 7-digit one, so a
    * full number is never carved into `555-<PHONE>` (the
    * partial-redaction artifact of the old NNN-NNNN-only pattern).
    * Separators are `-`, `.`, or space; like the IPv4 pattern this
    * over-matches rather than leaks (a scrubber's contract). */
  val phonePattern: String =
    "(?:\\(\\d{3}\\) ?\\d{3}[-. ]\\d{4}\\b" +
      "|(?:\\+1[-. ])?\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b" +
      "|\\b\\d{3}-\\d{4}\\b)"

  /** US SSN, dashed form NNN-NN-NNNN. Redacted BEFORE phones: the
    * 7-digit phone alternative would otherwise carve the `NN-NNNN`
    * tail out of an SSN (`\b` holds inside `123-45-6789` after the
    * first dash), producing the partial-redaction artifact the phone
    * pattern itself was widened to avoid. */
  val ssnPattern: String = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** Payment-card shapes: 4-4-4-4 digit groups (Visa/MC/Discover),
    * 4-6-5 groups (Amex 15-digit), each with `-`/space separators, or
    * a bare 13–19 digit run (the ISO/IEC 7812 PAN length range:
    * 13-digit legacy Visa through 19-digit Maestro/UnionPay). No Luhn
    * check — a regex scrubber over-matches rather than leaks (the
    * IPv4 contract); validation belongs to a detector, not a
    * redactor. Grouped forms first so a separated card never
    * half-matches the bare alternative; the bare alternative's `\b`
    * tail keeps 20+-digit runs unmatched in BOTH engines (greedy
    * retreat 19→13 finds a digit after every stop, so Java and RE2
    * agree on no-match). */
  val creditCardPattern: String =
    "(?:\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b" +
      "|\\b\\d{4}[- ]\\d{6}[- ]\\d{5}\\b" +
      "|\\b\\d{13,19}\\b)"

  /** IBAN shape: country code + 2 check digits + 11–30 alphanumerics,
    * uppercase only (real IBANs are; lowercase word soup cannot
    * collide). Shape-only, same over-match contract as the card
    * pattern. */
  val ibanPattern: String = "\\b[A-Z]{2}\\d{2}[A-Z0-9]{11,30}\\b"

  /** Number of matches of `pattern` in `text`. */
  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  def emailCount(text: Column): Column = countMatches(text, emailPattern)
  def ipv4Count(text: Column): Column = countMatches(text, ipv4Pattern)
  def phoneCount(text: Column): Column = countMatches(text, phonePattern)
  def ssnCount(text: Column): Column = countMatches(text, ssnPattern)
  def creditCardCount(text: Column): Column =
    countMatches(text, creditCardPattern)
  def ibanCount(text: Column): Column = countMatches(text, ibanPattern)

  /** All redactions in contract order (email → IPv4 → IBAN → SSN →
    * card → phone): email bodies may contain dots and digits the
    * later patterns would carve up; the IBAN's digit tail could
    * otherwise lose its leading digits to the bare-16 card
    * alternative; SSNs and cards must both go before the phone
    * pattern's 7-digit alternative (see [[ssnPattern]]). */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(text, emailPattern, "<EMAIL>"),
              ipv4Pattern, "<IP>"),
            ibanPattern, "<IBAN>"),
          ssnPattern, "<SSN>"),
        creditCardPattern, "<CARD>"),
      phonePattern, "<PHONE>")
}
