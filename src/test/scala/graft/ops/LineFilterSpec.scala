package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** C4 line-rule semantics: each rule drops independently, prose
  * survives, order is preserved, and degenerate documents behave. */
class LineFilterSpec extends SparkSpecBase {

  private def cleanOf(text: String): (Long, Long, String) = {
    import spark.implicits._
    val r = Seq(Tuple1(text)).toDF("t")
      .select(size(LineFilter.lines($"t")).cast("long"),
        size(LineFilter.keptLines($"t")).cast("long"),
        LineFilter.clean($"t"))
      .head()
    (r.getLong(0), r.getLong(1), r.getString(2))
  }

  test("each C4 rule drops its line; prose passes; order preserved") {
    val doc = Seq(
      "This is a perfectly normal sentence of prose.", // keep
      "home | about | contact", // no terminal punctuation
      "Please enable javascript to continue reading.", // marker word
      "Ok.", // < 3 words
      "function f() { return 1; }", // brace marker (and no terminal .?!)
      "Another good line ends with a question?", // keep
      "She said \"stop right there.\"" // terminal . inside closing quote
    ).mkString("\n")
    val (nLines, nKept, clean) = cleanOf(doc)
    assert(nLines == 7L && nKept == 3L)
    assert(clean == Seq(
      "This is a perfectly normal sentence of prose.",
      "Another good line ends with a question?",
      "She said \"stop right there.\"").mkString("\n"))
  }

  test("single-line and all-dropped documents") {
    assert(cleanOf("Plain single line of text.") ==
      (1L, 1L, "Plain single line of text."))
    val (n, k, c) = cleanOf("nav | bar\nok.")
    assert(n == 2L && k == 0L && c == "")
  }

  test("minWords is a knob") {
    import spark.implicits._
    val kept = Seq(Tuple1("Two words.\nThree short words."))
      .toDF("t")
      .select(size(LineFilter.keptLines($"t", minWords = 2)).cast("long"))
      .head().getLong(0)
    assert(kept == 2L) // both survive at minWords=2; default drops one
  }
}
