package graft.ops

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Issue/PR reference extraction — the reference's "linker" scalar layer.
  *
  * Semantics (not code) from /root/reference/src/retrieval/linkers.py:
  *   - ISSUE_REF_RE   linkers.py:17-21 — `fixes #123` / `owner/repo#123`
  *     with an optional leading closing-keyword group.
  *   - CROSS_REPO_RE  linkers.py:22-26 — `owner/repo#N`, `/issues/N`,
  *     `/pull/N`, optional `https://github.com/` prefix.
  *   - extract_issue_refs_detailed linkers.py:29-52 — text split into
  *     sentences on `(?<=[.!?\n])\s+`; a ref has_closing_kw when its own
  *     keyword group matched OR its sentence contains a closing keyword
  *     anywhere (sentence-scoped flag).
  *
  * Exposed as Scala functions (unit-testable) plus Spark UDFs returning
  * Array[Struct], so the engine can explode refs per document. The UDF
  * is per-row pure scalar work — embarrassingly parallel, no state — so
  * it scales linearly; a codegen'd Expression would only shave the
  * serialization overhead.
  */
object TextRefs {

  /** One issue reference found in text. `full_repo` is null for bare
    * `#123` refs (caller resolves against the current repo). */
  case class IssueRef(full_repo: String, number: Long, has_closing_kw: Boolean)

  /** One cross-repo mention. `kind` is "issues"/"pull" for URL-style
    * mentions, null for `owner/repo#N` style. */
  case class CrossRef(full_repo: String, kind: String, number: Long)

  // UNICODE_CHARACTER_CLASS everywhere: Python's `re` gives \b/\s/\d
  // Unicode semantics on str patterns, while Java defaults them to
  // ASCII — without the flag "closesé #5" gets a spurious word
  // boundary (é is a word char to Python), NBSP doesn't separate a
  // keyword from its ref, and U+2028 doesn't split sentences.
  private val uFlags = Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CHARACTER_CLASS

  private val issueRefPattern = Pattern.compile(
    "(?:(?<kw>close[sd]?|fixe?[sd]?|resolve[sd]?)\\s*[:\\-–—]*\\s+)?" +
      "(?:(?<full>[A-Za-z0-9_.-]+/[A-Za-z0-9_.-]+)#(?<num1>\\d+)|#(?<num2>\\d+))",
    uFlags)

  private val crossRepoPattern = Pattern.compile(
    "(?:(?:https?://github\\.com/)?(?<full>[A-Za-z0-9_.-]+/[A-Za-z0-9_.-]+)" +
      "(?:(?:/(?<kind>issues|pull))/(?<num1>\\d+)|#(?<num2>\\d+)))",
    uFlags)

  private val closingKwPattern = Pattern.compile(
    "\\b(close[sd]?|fixe?[sd]?|resolve[sd]?)\\b", uFlags)

  /** Sentence boundary: lookbehind for ., !, ? or newline, then spaces. */
  private val sentenceSplitPattern = Pattern.compile("(?<=[.!?\\n])\\s+",
    Pattern.UNICODE_CHARACTER_CLASS)

  /** Base-10 value of a digit run the Unicode-aware \d matched —
    * Python's int() accepts any Unicode decimal digits (e.g. ٤٢),
    * Long.parseLong does not. Long-width so pathological 10-18-digit
    * "refs" keep their value like the reference's unbounded int (a
    * >18-digit run would wrap — document-noise territory the
    * reference would also never resolve to a real issue). */
  private def longOfDigits(s: String): Long = {
    var r = 0L
    var i = 0
    while (i < s.length) {
      r = r * 10 + Character.digit(s.charAt(i), 10)
      i += 1
    }
    r
  }

  def hasClosingKeyword(s: String): Boolean =
    s != null && closingKwPattern.matcher(s).find()

  /** Sentence-scoped issue-ref extraction (linkers.py:29-52). */
  def extractIssueRefs(text: String): Seq[IssueRef] = {
    if (text == null || text.isEmpty) return Seq.empty
    val out = Seq.newBuilder[IssueRef]
    // -1 limit keeps trailing empty strings, matching Python re.split;
    // empty sentences are skipped either way.
    for (sent <- sentenceSplitPattern.split(text, -1) if sent.nonEmpty) {
      val sentenceHasKw = hasClosingKeyword(sent)
      val m = issueRefPattern.matcher(sent)
      while (m.find()) {
        val number = Option(m.group("num1")).getOrElse(m.group("num2"))
        if (number != null) {
          val hasKw = m.group("kw") != null || sentenceHasKw
          out += IssueRef(m.group("full"), longOfDigits(number), hasKw)
        }
      }
    }
    out.result()
  }

  /** Cross-repo mention extraction (linkers.py:245-320 scan loop). */
  def extractCrossRepoRefs(text: String): Seq[CrossRef] = {
    if (text == null || text.isEmpty) return Seq.empty
    val out = Seq.newBuilder[CrossRef]
    val m = crossRepoPattern.matcher(text)
    while (m.find()) {
      val number = Option(m.group("num1")).getOrElse(m.group("num2"))
      if (number != null)
        out += CrossRef(m.group("full"), m.group("kind"), longOfDigits(number))
    }
    out.result()
  }

  /** First line of a commit/blame message, trimmed (collectors.py:51-55). */
  def oneLine(msg: String): String =
    if (msg == null || msg.isEmpty) ""
    else msg.linesIterator.nextOption().getOrElse("").trim

  // ---- Spark column functions -------------------------------------------

  val extractIssueRefsUdf =
    udf((text: String) => extractIssueRefs(text))
  val extractCrossRepoRefsUdf =
    udf((text: String) => extractCrossRepoRefs(text))
  val oneLineUdf = udf((msg: String) => oneLine(msg))

  def extract_issue_refs(c: Column): Column = extractIssueRefsUdf(c)
  def extract_cross_repo_refs(c: Column): Column = extractCrossRepoRefsUdf(c)
  def one_line(c: Column): Column = oneLineUdf(c)
}
