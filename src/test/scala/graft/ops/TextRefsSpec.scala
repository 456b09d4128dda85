package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Semantics pinned from reference linkers.py:17-52 and its unit tests
  * (tests/test_linkers.py:12-17): bare and cross-repo refs, the optional
  * closing-keyword group, and the sentence-scoped has_closing_kw flag.
  */
class TextRefsSpec extends AnyFunSuite {
  import TextRefs._

  test("bare ref with closing keyword") {
    assert(extractIssueRefs("Fixes #123") ==
      Seq(IssueRef(null, 123, has_closing_kw = true)))
  }

  test("cross-repo ref") {
    assert(extractIssueRefs("see owner/repo#45") ==
      Seq(IssueRef("owner/repo", 45, has_closing_kw = false)))
  }

  test("keyword variants all match") {
    for (kw <- Seq("close", "closes", "closed", "fix", "fixes", "fixed",
        "resolve", "resolves", "resolved", "Fixes", "CLOSES")) {
      val refs = extractIssueRefs(s"$kw #7")
      assert(refs == Seq(IssueRef(null, 7, has_closing_kw = true)),
        s"keyword $kw")
    }
  }

  test("sentence-scoped keyword: flag applies within the sentence only") {
    // kw in first sentence marks #1 but not #2 in the second sentence
    val refs = extractIssueRefs("This fixes #1. See also #2.")
    assert(refs == Seq(
      IssueRef(null, 1, has_closing_kw = true),
      IssueRef(null, 2, has_closing_kw = false)))
  }

  test("keyword anywhere in sentence marks refs without their own kw group") {
    val refs = extractIssueRefs("resolved by this change: #9 and #10")
    assert(refs.map(_.number) == Seq(9, 10))
    assert(refs.forall(_.has_closing_kw))
  }

  test("newline boundary splits only when followed by whitespace (re.split parity)") {
    // Python re.split(r'(?<=[.!?\n])\s+') needs \s+ AFTER the boundary
    // char, so a bare "\n" joins the lines into one sentence — the kw
    // then marks both refs. With trailing whitespace the split happens.
    val joined = extractIssueRefs("fixes #1\nunrelated #2")
    assert(joined.map(_.has_closing_kw) == Seq(true, true))
    val split = extractIssueRefs("fixes #1\n unrelated #2")
    assert(split == Seq(
      IssueRef(null, 1, has_closing_kw = true),
      IssueRef(null, 2, has_closing_kw = false)))
  }

  test("no refs in plain text / null / empty") {
    assert(extractIssueRefs("nothing to see").isEmpty)
    assert(extractIssueRefs(null).isEmpty)
    assert(extractIssueRefs("").isEmpty)
  }

  test("cross-repo extraction: owner/repo#N, /issues/N, /pull/N, URL") {
    assert(extractCrossRepoRefs("depends on foo/bar#12") ==
      Seq(CrossRef("foo/bar", null, 12)))
    assert(extractCrossRepoRefs("https://github.com/foo/bar/issues/3") ==
      Seq(CrossRef("foo/bar", "issues", 3)))
    assert(extractCrossRepoRefs("see foo/bar/pull/8 here") ==
      Seq(CrossRef("foo/bar", "pull", 8)))
    assert(extractCrossRepoRefs(
      "a foo/bar#1 b https://github.com/x/y/pull/2").map(_.number) ==
      Seq(1, 2))
  }

  test("one_line takes the first line trimmed") {
    assert(oneLine("  first line  \nsecond") == "first line")
    assert(oneLine("single") == "single")
    assert(oneLine(null) == "")
    assert(oneLine("") == "")
  }

  test("hasClosingKeyword is word-bounded") {
    assert(hasClosingKeyword("this fixes that"))
    assert(!hasClosingKeyword("prefixes and suffixes"))
    assert(!hasClosingKeyword("unfixed"))
  }
}
