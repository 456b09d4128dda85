package graft.ops

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

/** Differential parity against CPython `re` (the reference's regex
  * engine): tools/gen_textrefs_fixture.py runs the same extraction
  * semantics in Python over a seeded corpus (400 random cases + 12
  * handcrafted non-ASCII cases) and pins the expected refs; this spec
  * replays the corpus through the Scala implementation. Catches
  * Java-vs-Python regex divergence (lookbehind split behavior, word
  * boundaries incl. Unicode word chars, \s on NBSP/U+2028/U+3000,
  * Unicode decimal digits, case folding, '' separators).
  */
class TextRefsDifferentialSpec extends AnyFunSuite {

  // minimal JSON reader for the fixture's fixed shape (no JSON lib on
  // the compile classpath beyond Spark's internals)
  private case class Case(text: String, refs: Seq[TextRefs.IssueRef])

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def parseCases(json: String): Seq[Case] = {
    val caseRe =
      """(?s)\{\s*"text":\s*"((?:[^"\\]|\\.)*)",\s*"refs":\s*\[(.*?)\]\s*\}""".r
    val refRe =
      ("""\{\s*"full_repo":\s*(null|"(?:[^"\\]|\\.)*"),\s*"number":\s*(\d+),""" +
        """\s*"has_closing_kw":\s*(true|false)\s*\}""").r
    caseRe.findAllMatchIn(json).map { m =>
      val refs = refRe.findAllMatchIn(m.group(2)).map { r =>
        val repo = r.group(1) match {
          case "null" => null
          case quoted => unescape(quoted.substring(1, quoted.length - 1))
        }
        TextRefs.IssueRef(repo, r.group(2).toLong, r.group(3) == "true")
      }.toSeq
      Case(unescape(m.group(1)), refs)
    }.toSeq
  }

  test("412-case corpus matches CPython re extraction exactly") {
    val json = Source.fromInputStream(
      getClass.getResourceAsStream("/textrefs_fixture.json"), "UTF-8")
      .mkString
    val cases = parseCases(json)
    assert(cases.length == 412, s"parsed ${cases.length} fixture cases")
    var checked = 0
    for (c <- cases) {
      val got = TextRefs.extractIssueRefs(c.text)
      assert(got == c.refs,
        s"text=${c.text.replace("\n", "\\n")}\n got=$got\n want=${c.refs}")
      checked += got.length
    }
    assert(checked > 500) // the corpus is ref-dense, not vacuous
  }
}
