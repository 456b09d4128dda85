package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Markup/format-density signals — the "HTML leftovers" tier of a web
  * curation pipeline (RefinedWeb/FineWeb drop or clean documents whose
  * extraction left tags, code fences, or link farms behind; C4's
  * line rules — q65 — catch boilerplate SENTENCES, this catches
  * un-stripped FORMATTING). All three detectors are counting regexes
  * in the Java∩RE2 class form, exposed as constants so the q83 oracle
  * interpolates them verbatim (the Pii convention). Pure per-row scan
  * work — no shuffle anywhere.
  */
object Markup {

  /** An HTML/XML tag: `<div>`, `</a>`, `<a href="...">`. Anchored on
    * a letter after `<`/`</` so prose like "x < 5 and > 3" never
    * matches; body capped at 160 chars (a "tag" longer than that is
    * mangled text, not markup). */
  val tagPattern = "</?[a-zA-Z][^<>]{0,160}>"

  /** A fenced-code-block delimiter (the GitHub-Markdown triple
    * backtick). Two fences = one block; an odd count is a mangled
    * document, which scores as code anyway. */
  val fencePattern = "```"

  /** A Markdown inline link `[text](target)`. */
  val mdLinkPattern = "\\[[^\\]]{1,80}\\]\\([^()]{1,200}\\)"

  def tagCount(text: Column): Column =
    size(regexp_extract_all(text, lit(tagPattern), lit(0))).cast("long")

  def fenceCount(text: Column): Column =
    size(regexp_extract_all(text, lit(fencePattern), lit(0))).cast("long")

  def mdLinkCount(text: Column): Column =
    size(regexp_extract_all(text, lit(mdLinkPattern), lit(0))).cast("long")
}
