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
  * exact match set. Redaction applies the three patterns in a FIXED
  * order (email → IPv4 → phone): email bodies may contain dots and
  * digits that the later patterns would otherwise carve up, so the
  * order is part of the operator's contract (PiiSpec pins it).
  */
object Pii {

  /** user@host.tld with the common local-part charset. */
  val emailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (unvalidated octets — a scrubber over-matches
    * rather than leaks; 999.0.0.1 is redacted too). */
  val ipv4Pattern: String =
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Short phone form NNN-NNNN (the fixture corpus's shape; extend
    * with locale forms in production). */
  val phonePattern: String = "\\b\\d{3}-\\d{4}\\b"

  /** Number of matches of `pattern` in `text`. */
  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  def emailCount(text: Column): Column = countMatches(text, emailPattern)
  def ipv4Count(text: Column): Column = countMatches(text, ipv4Pattern)
  def phoneCount(text: Column): Column = countMatches(text, phonePattern)

  /** All three redactions in contract order (email → IPv4 → phone). */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      phonePattern, "<PHONE>")
}
