package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL extraction and domain accounting — the link-hygiene tier of a
  * web curation pipeline (URL-level blocklists and per-domain volume
  * caps are the first filters RefinedWeb/C4 apply, before any text
  * rule runs). Counting/extraction regexes in the Java∩RE2 class form,
  * exposed as constants so the q88 oracle interpolates them verbatim
  * (the Pii convention). Extraction is pure per-row scan work; the
  * domain rollup is one domains-sized aggregation.
  */
object Urls {

  /** An absolute http(s) URL: scheme, host charset, optional path (no
    * whitespace). Over-matches trailing punctuation by design — a
    * blocklist matcher wants the superset. */
  val urlPattern: String = "https?://[A-Za-z0-9.-]+(?:/[^\\s]*)?"

  /** Capture group 1 = the host part of a URL. */
  val domainPattern: String = "https?://([A-Za-z0-9.-]+)"

  /** Domains a curation run drops outright (trackers/ad-tech in a real
    * pipeline; one representative here — the operator shape is the
    * point, swap in a full list for production). */
  val blocklist: Seq[String] = Seq("ads.example")

  /** All URLs in `text` as an array. */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(urlPattern), lit(0))

  /** Host part of a single URL string. */
  def domainOf(url: Column): Column =
    regexp_extract(url, domainPattern, 1)

  /** 1 when the domain is on the blocklist. */
  def blocked(domain: Column): Column =
    domain.isInCollection(blocklist).cast("long")
}
