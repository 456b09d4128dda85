package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.QueryString.{parse, Parsed}

/** The simple_query_string parser contract: clause classification,
  * analyzer-twin tokenization, and the never-throws degradation rules
  * ES guarantees for this grammar. */
class QueryStringSpec extends AnyFunSuite {

  test("classifies +must, -must_not, bare should, and quoted phrases") {
    val p = parse("""+scan +column window -merge "order sort"""")
    assert(p == Parsed(Seq("scan", "column"), Seq("window"),
      Seq("merge"), Seq(Seq("order", "sort"))))
  }

  test("tokenization is the analyzer's exact twin") {
    // lowercase, non-letter/digit split, stopword drop — a term that
    // survives FullText.analyze must survive here and vice versa
    val p = parse("""The FAST-cat +IS +Query-Plan "And The Big DOG"""")
    assert(p.should == Seq("fast", "cat"),
      "multi-word unquoted tokens contribute each surviving word")
    assert(p.must == Seq("query", "plan"),
      "stopword 'is' vanishes even under +; hyphen splits")
    assert(p.phrases == Seq(Seq("big", "dog")),
      "phrase content analyzes too (stopwords drop)")
  }

  test("never throws: degradation rules") {
    // unterminated quote runs to end of string
    assert(parse("""scan "open phrase""").phrases ==
      Seq(Seq("open", "phrase")))
    // bare operators and empty quotes drop
    assert(parse("""+ - "" +the""") == Parsed(Nil, Nil, Nil, Nil))
    // a +/- prefix on a QUOTED phrase parses as a plain phrase clause
    assert(parse("""+"a big cat"""").phrases == Seq(Seq("big", "cat")))
    // junk soup
    assert(parse("""+++ --- "" " """) ==
      Parsed(Nil, Nil, Nil, Nil))
    assert(parse("") == Parsed(Nil, Nil, Nil, Nil))
  }
}
