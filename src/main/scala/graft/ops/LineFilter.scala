package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** C4-style line-level boilerplate filtering (Raffel et al. 2020,
  * "Exploring the Limits of Transfer Learning" §2.2 — the cleaning
  * rules behind the C4 corpus): a document is split into lines and a
  * line survives only if it
  *
  *   1. ends in terminal punctuation (`.` `!` `?` or a closing
  *      quote),
  *   2. has at least `minWords` words, and
  *   3. mentions none of the boilerplate markers (C4 drops lines
  *      with "javascript", the lorem-ipsum placeholder, and code
  *      braces).
  *
  * Navigation bars, cookie banners, "enable javascript" shells and
  * stray code survive none of these; prose survives all. Pure
  * per-row HOF map work over the line array — no shuffle, rides the
  * scan (the lambda bodies are regex/size builtins; line counts per
  * document are small, so the interpreted HOF is not a hot path —
  * the q58-kernel treatment applies if a corpus proves otherwise).
  * Patterns are the Java∩RE2 class form (the Pii discipline) so the
  * DuckDB oracle replicates exact keep sets.
  */
object LineFilter {

  /** Terminal-punctuation rule: `.` `!` `?` optionally followed by a
    * closing double quote, at end of line (trailing blanks ok). */
  val terminalPattern: String = "[.!?]\"?\\s*$"

  /** Boilerplate markers, matched case-insensitively on the line
    * (C4's list: javascript shells, lorem ipsum, code braces). */
  val boilerplatePattern: String = "javascript|lorem ipsum|\\{"

  /** Keep-predicate for one line column. */
  def keepLine(l: Column, minWords: Int = 3): Column =
    l.rlike(terminalPattern) &&
      size(filter(split(trim(l), "\\s+"), w => length(w) > 0)) >= minWords &&
      !lower(l).rlike(boilerplatePattern)

  /** Array of a document's lines. */
  def lines(text: Column): Column = split(text, "\n")

  /** The surviving lines, original order preserved. */
  def keptLines(text: Column, minWords: Int = 3): Column =
    filter(lines(text), l => keepLine(l, minWords))

  /** Cleaned text: surviving lines re-joined with newlines. */
  def clean(text: Column, minWords: Int = 3): Column =
    array_join(keptLines(text, minWords), "\n")
}
