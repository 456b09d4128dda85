package graft.ops

/** Parser for the ES `simple_query_string` syntax — the reduced
  * Lucene grammar ES guarantees NEVER throws on user input (the
  * search-box query language; reference mapping context
  * schema.py:13-19's `text_en` fields are what users type these
  * queries against): `+term` is a must clause, `-term` a must_not,
  * `"quoted words"` a phrase clause, anything else a should term
  * (`default_operator: OR`, the ES default). Subset scope, documented
  * here and spec-pinned: no `|`/`~N`/`(`-grouping operators, and a
  * `+`/`-` prefix on a QUOTED phrase parses as a plain phrase clause.
  * Malformed input degrades, never errors — an unterminated quote
  * runs to end of string, a bare `+`/`-` with no term is dropped —
  * the simple_query_string contract.
  *
  * Tokenization mirrors the `text_en` analyzer EXACTLY (lowercase,
  * split on non-letter/digit runs, English stopwords dropped) so a
  * parsed term hits the same postings the Column-side
  * [[FullText.analyze]] builds — a term that survives one must
  * survive the other (QueryStringSpec pins the twin behavior). A
  * multi-word unquoted token ("scan/sort") contributes each surviving
  * word under its prefix's clause, as ES does after analysis.
  */
object QueryString {

  /** The four clause lists a simple_query_string reduces to. */
  final case class Parsed(
      must: Seq[String], should: Seq[String], mustNot: Seq[String],
      phrases: Seq[Seq[String]]) {
    def scoringTerms: Seq[String] = must ++ should
  }

  /** Driver-side twin of [[FullText.analyze]] (same regex, same
    * stopword list). */
  def analyzeText(s: String): Seq[String] =
    s.toLowerCase.split("[^\\p{L}\\p{Nd}]+").toSeq
      .filter(t => t.nonEmpty && !FullText.englishStopwords.contains(t))

  def parse(q: String): Parsed = {
    var must = Vector.empty[String]
    var should = Vector.empty[String]
    var mustNot = Vector.empty[String]
    var phrases = Vector.empty[Seq[String]]
    val n = q.length
    var i = 0
    while (i < n) {
      if (q(i).isWhitespace) i += 1
      else {
        var op = ' '
        var j = i
        if (q(j) == '+' || q(j) == '-') { op = q(j); j += 1 }
        if (j < n && q(j) == '"') {
          val end = q.indexOf('"', j + 1)
          val (body, next) =
            if (end < 0) (q.substring(j + 1), n)
            else (q.substring(j + 1, end), end + 1)
          val toks = analyzeText(body)
          if (toks.nonEmpty) phrases :+= toks
          i = next
        } else {
          var k = j
          while (k < n && !q(k).isWhitespace) k += 1
          analyzeText(q.substring(j, k)).foreach { t =>
            op match {
              case '+' => must :+= t
              case '-' => mustNot :+= t
              case _   => should :+= t
            }
          }
          i = k
        }
      }
    }
    Parsed(must, should, mustNot, phrases)
  }
}
