package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class FullTextSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("analyzer lowercases, splits on non-alphanumerics, drops English stopwords") {
    val out = docs((1L, "The Quick-Brown FOX, and a dog!"))
      .select(FullText.analyze($"text").as("toks"))
      .head.getSeq[String](0)
    assert(out == Seq("quick", "brown", "fox", "dog"))
  }

  test("analyzer is Unicode-aware: accents and non-Latin words stay whole") {
    // The exact token sets DuckDB's RE2 derives for the same strings
    // (verified out-of-band) — the analyzer regex is the Java∩RE2
    // \p{L}/\p{Nd} class form, so both engines must tokenize alike.
    val out = docs(
      (1L, "Café NAÏVE résumé 123 text, x—y"), // em-dash boundary
      (2L, "日本語 text"), // unspaced CJK run = ONE token (not ES per-char)
      (3L, "Ünïcode-Wörds"))
      .orderBy($"doc_id")
      .select(FullText.analyze($"text").as("toks"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("café", "naïve", "résumé", "123", "text", "x", "y"))
    assert(out(1) == Seq("日本語", "text"))
    assert(out(2) == Seq("ünïcode", "wörds"))
  }

  test("bm25 matches a hand-computed score on a 3-doc corpus") {
    // Corpus: d1 has "cat" twice of 4 tokens, d2 has "cat" once of 2,
    // d3 no match. N=3, df(cat)=2, doclens 4/2/3, avgdl=3.
    val d = docs(
      (1L, "cat cat dog bird"),
      (2L, "cat fish"),
      (3L, "dog bird fish"))
    val got = FullText.bm25TopK(d, "doc_id", "text", Seq("cat"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))

    val k1 = 1.2; val b = 0.75
    val idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    def s(tf: Double, dl: Double) =
      BigDecimal(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / 3.0)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // d2: shorter doc, single occurrence; d1: two occurrences, longer.
    val expected = Seq(1L -> s(2, 4), 2L -> s(1, 2))
      .sortBy { case (id, sc) => (-sc, id) }
    assert(got.toSeq == expected)
    assert(!got.map(_._1).contains(3L))
  }

  test("multi-term scores sum per document and rank accordingly") {
    val d = docs(
      (1L, "spark query engine"),
      (2L, "spark spark spark"),
      (3L, "query planner"),
      (4L, "unrelated words here"))
    val got = FullText.bm25TopK(d, "doc_id", "text",
      Seq("spark", "query"), k = 10).collect()
    // d1 matches both terms; its summed score must exceed every
    // single-term doc's.
    assert(got.head.getLong(0) == 1L)
    assert(got.map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
  }

  test("stopword-only and empty documents neither match nor break length stats") {
    val d = docs(
      (1L, "the and of to"),
      (2L, ""),
      (3L, "vector search"))
    val got = FullText.bm25TopK(d, "doc_id", "text", Seq("vector"), k = 5)
      .collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(3L))
    assert(got.head.getDouble(1) > 0.0)
  }

  test("k caps the result and ties break by doc id") {
    val d = docs((1L to 6L).map(i => i -> "same text match"): _*)
    val got = FullText.bm25TopK(d, "doc_id", "text", Seq("match"), k = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  test("phraseCount: consecutive-only, overlapping, across removed stopwords") {
    import spark.implicits._
    val rows = Seq(
      (1L, "red fox red fox red"),        // "red fox" twice
      (2L, "red cat fox"),                // terms present, not adjacent
      (3L, "red the fox runs"),           // stopword gap closes (documented)
      (4L, "fox red"),                    // reversed — no match
      (5L, "")).toDF("doc_id", "text")
    val out = rows
      .select($"doc_id", FullText.phraseCount(
        FullText.analyze($"text"), Seq("red", "fox")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 2L)
    assert(out(2L) == 0L)
    assert(out(3L) == 1L,
      "analyzed positions are consecutive after stopword removal")
    assert(out(4L) == 0L)
    assert(out(5L) == 0L)
  }

  test("bm25PhraseTopK: more phrase hits outrank fewer at equal length") {
    import spark.implicits._
    val docs = Seq(
      (1L, "red fox runs red fox jumps over hills"),
      (2L, "red fox naps then quietly sits all day"),
      (3L, "green cat naps then quietly sits all day")).toDF("doc_id", "text")
    val out = FullText.bm25PhraseTopK(docs, "doc_id", "text",
      Seq("red", "fox")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L),
      "only phrase-matching docs appear, double-hit first")
    assert(out(0).getLong(1) == 2L && out(1).getLong(1) == 1L)
    assert(out(0).getDouble(2) > out(1).getDouble(2))
  }

  private def fieldedDocs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "title", "body")

  test("multi_match: a boosted title hit outranks an unboosted body hit") {
    val d = fieldedDocs(
      (1L, "cat runs", "dog bird fish"),
      (2L, "dog sleeps", "cat cat dog bird"),
      (3L, "fish swim", "dog bird swims"))
    val out = FullText.bm25MultiFieldTopK(d, "doc_id",
      Seq("title" -> 2.0, "body" -> 1.0), Seq("cat")).collect()
    // d1's single title hit (boost 2) beats d2's double body hit
    // (boost 1); d3 matches nothing and is absent
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).getDouble(1) > out(1).getDouble(1))
  }

  test("multi_match composes per-field BM25: best = max + tie·rest, most = sum") {
    val d = fieldedDocs(
      (1L, "cat runs", "cat dog bird"),
      (2L, "dog sleeps", "cat cat dog bird"),
      (3L, "fish swim", "dog bird swims"))
    val tie = 0.3
    val out = FullText.bm25MultiFieldTopK(d, "doc_id",
      Seq("title" -> 2.0, "body" -> 1.0), Seq("cat"), tieBreaker = tie)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    // per-field reference scores from the single-field operator (its
    // own spec pins the formula), boosts applied outside
    def field(c: String, boost: Double): Map[Long, Double] =
      FullText.bm25TopK(d, "doc_id", c, Seq("cat"), k = 10)
        .collect().map(r => r.getLong(0) -> boost * r.getDouble(1)).toMap
    val t = field("title", 2.0); val b = field("body", 1.0)
    for (id <- out.keys) {
      val scores = Seq(t.get(id), b.get(id)).flatten
      val best = scores.max; val total = scores.sum
      val (gotBest, gotMost) = out(id)
      assert(math.abs(gotBest - (best + tie * (total - best))) < 1e-3,
        s"doc $id best_fields")
      assert(math.abs(gotMost - total) < 1e-3, s"doc $id most_fields")
    }
    // d1 matches BOTH fields, so its most_fields exceeds its
    // dis_max-with-tiebreak score; single-field docs collapse to equal
    assert(out(1L)._2 > out(1L)._1)
    assert(math.abs(out(2L)._2 - out(2L)._1) < 1e-3)
  }

  test("cross_fields blends df: a rare-in-title term takes the common-in-body idf") {
    import spark.implicits._
    // 'cat' has df 1 in titles but df 3 in bodies → blended df = 3.
    // cross_fields must deflate d1's title hit to the common-term idf
    // (the first/last-name-across-fields fix), while field-centric
    // best_fields keeps the inflated rare-term idf.
    val d = fieldedDocs(
      (1L, "cat runs", "dog bird fish"),
      (2L, "dog naps", "cat swims deep"),
      (3L, "dog sits", "cat dives low"),
      (4L, "dog howls", "cat floats high"))
    val out = FullText.bm25MultiFieldTopK(d, "doc_id",
      Seq("title" -> 2.0, "body" -> 1.0), Seq("cat"),
      tieBreaker = 0.0)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(3)))).toMap
    assert(out(1L)._2 < out(1L)._1,
      "blended df must deflate the rare-in-title match")
    // body-only matches: the field's own df IS the blended df, so
    // cross collapses to the (boost-1) field score = best at tie 0
    assert(math.abs(out(2L)._2 - out(2L)._1) < 1e-3)
  }

  test("cross_fields tie_breaker adds the non-best fields' blended scores per term") {
    val d = fieldedDocs(
      (1L, "cat runs", "cat dog bird"), // 'cat' in BOTH fields
      (2L, "dog naps", "cat swims deep"), // body only
      (3L, "fish swim", "dog bird low"))
    def cross(tie: Double): Map[Long, Double] =
      FullText.bm25MultiFieldTopK(d, "doc_id",
        Seq("title" -> 2.0, "body" -> 1.0), Seq("cat"), tieBreaker = tie)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val t0 = cross(0.0); val t5 = cross(0.5)
    // both-fields match: tie > 0 must add the weaker field's blended
    // score on top of the max-only composition (ES applies the one
    // multi_match tie_breaker within per-term field scores)
    assert(t5(1L) > t0(1L))
    // single-field match: no other-field score to add — invariant
    assert(math.abs(t5(2L) - t0(2L)) < 1e-3)
  }

  test("highlightTerms wraps matched analyzed tokens in <em> tags") {
    val out = docs((1L, "The Fast CAT runs a fast race!"), (2L, null))
      .orderBy($"doc_id")
      .select(FullText.highlightTerms($"text", Seq("fast", "race")))
      .collect()
    // analyzed rendering: lowercased, stopwords gone, matches wrapped
    assert(out(0).getString(0) ==
      "<em>fast</em> cat runs <em>fast</em> <em>race</em>")
    assert(out(1).isNullAt(0), "null text stays null")
  }

  test("fuzzy: exact match outranks an ed-1 expansion; far terms never match") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark engine runs jobs well today"),
      (2L, "sparc engine runs jobs well today"),
      (3L, "postgres engine runs jobs well today")).toDF("doc_id", "text")
    val out = FullText.bm25FuzzyTopK(docs, "doc_id", "text",
      Seq("sparc"), maxEdits = 1).collect()
    // "sparc" matches itself (ed 0, boost 1) and "spark" (ed 1,
    // boost 1 - 1/5); both terms have df 1, identical tf/doclen, so
    // the exact doc must outrank the fuzzy one; "postgres" never
    // appears
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 1L))
    assert(out(0).getDouble(1) > out(1).getDouble(1))
    assert(math.abs(out(1).getDouble(1) / out(0).getDouble(1) - 0.8) < 0.01,
      "ed-1 score is the exact score degraded by 1 - ed/len")
  }

  test("fuzzy: boost denominator is min(|term|, |qterm|) — the Lucene FuzzyQuery rule") {
    import spark.implicits._
    // query term "cat" (len 3) expands to vocab term "cart" (len 4,
    // ed 1): Lucene divides by the SHORTER length → boost 1 − 1/3,
    // not 1 − 1/4. Both docs pad to identical doclen/tf/df so the
    // score ratio isolates the boost.
    val docs = Seq(
      (1L, "cat engine runs jobs well today"),
      (2L, "cart engine runs jobs well today")).toDF("doc_id", "text")
    val out = FullText.bm25FuzzyTopK(docs, "doc_id", "text",
      Seq("cat"), maxEdits = 1).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(math.abs(out(1).getDouble(1) / out(0).getDouble(1) -
      (1.0 - 1.0 / 3.0)) < 0.01,
      "ed-1 boost uses the query term's length 3, not the expansion's 4")
  }

  test("more-like-this: seed never appears, scores rank descending") {
    val dir = "/root/testdata/sf0.001"
    val seedId = graft.io.Tables.documents(spark, dir)
      .agg(org.apache.spark.sql.functions.min(
        org.apache.spark.sql.functions.col("doc_id"))).head().getLong(0)
    val out = graft.queries.TextQueries.moreLikeThis(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 20)
    assert(!out.map(_.getLong(0)).contains(seedId),
      "a document is not similar to itself")
    val scores = out.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse, "descending score order")
    assert(scores.forall(_ > 0.0))
  }

  test("bestFragment picks the densest window, earliest on ties, null when unmatched") {
    import spark.implicits._
    val rows = Seq(
      // hits cluster at the tail: the best 3-token window is the last
      (1L, "one two three cat dog cat"),
      // two windows tie at 1 hit — the EARLIEST wins
      (2L, "cat one two three four cat five"),
      (3L, "no matching words here"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .orderBy($"doc_id")
      .select(FullText.bestFragment($"text", Seq("cat", "dog"), window = 3))
      .collect()
    assert(rows(0).getString(0) == "<em>cat</em> <em>dog</em> <em>cat</em>")
    assert(rows(1).getString(0) == "<em>cat</em> one two")
    assert(rows(2).isNullAt(0), "unmatched field has no highlight")
    assert(rows(3).isNullAt(0), "null text stays null")
  }

  test("bestFragment: docs shorter than the window render whole") {
    import spark.implicits._
    val out = Seq((1L, "tiny cat"))
      .toDF("doc_id", "text")
      .select(FullText.bestFragment($"text", Seq("cat"), window = 8))
      .head().getString(0)
    assert(out == "tiny <em>cat</em>")
  }

  test("hybrid RRF: fused score recomputes from the emitted leg ranks") {
    val out = graft.queries.TextQueries
      .hybridRrfSearch(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty && out.length <= 10)
    val scores = out.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse, "descending fusion order")
    out.foreach { r =>
      val bm = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val kn = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(bm.nonEmpty || kn.nonEmpty, "a fused doc has at least one leg")
      (bm.toSeq ++ kn.toSeq).foreach(rk => assert(rk >= 1 && rk <= 20))
      val expect = BigDecimal(
        bm.map(rk => 1.0 / (60 + rk)).getOrElse(0.0) +
          kn.map(rk => 1.0 / (60 + rk)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(1) - expect) < 1e-9,
        s"doc ${r.getLong(0)}: fusion math")
    }
    // RRF's defining property: a doc in BOTH legs beats a doc whose
    // single-leg rank equals its worse leg rank
    val both = out.filter(r => !r.isNullAt(2) && !r.isNullAt(3))
    val single = out.filter(r => r.isNullAt(2) ^ r.isNullAt(3))
    for (b <- both; s <- single) {
      val bWorse = math.max(b.getLong(2), b.getLong(3))
      val sRank = if (s.isNullAt(2)) s.getLong(3) else s.getLong(2)
      if (sRank >= bWorse) assert(b.getDouble(1) > s.getDouble(1))
    }
  }

  test("function_score: final = bm25 × ln1p factor, ranked after multiplication") {
    val out = graft.queries.TextQueries
      .functionScoreSearch(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty && out.length <= 20)
    val finals = out.map(_.getDouble(3)).toSeq
    assert(finals == finals.sorted.reverse, "ranked by the BOOSTED score")
    out.foreach { r =>
      val expect = BigDecimal(r.getDouble(1) * r.getDouble(2))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - expect) < 1e-9, "boost math")
      assert(r.getDouble(2) > 0.0, "ln1p of a positive length")
    }
  }

  test("term suggester: dropped-char input recovers its source term, DirectSpellChecker order") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.TextQueries.termSuggest(spark, dir).collect()
    assert(out.nonEmpty)
    val byInput = out.groupBy(_.getString(0))
    val freq = graft.io.Tables.documents(spark, dir)
      .select(explode(FullText.analyze($"text")).as("t"))
      .groupBy($"t").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"t".asc).limit(2)
      .collect().map(_.getString(0))
    byInput.foreach { case (input, rows) =>
      // ranks contiguous from 1; ordered by (ed asc, freq desc, term)
      assert(rows.map(_.getLong(1)).toSeq == (1L to rows.length).toSeq)
      val keys = rows.map(r =>
        (r.getLong(3), -r.getLong(4), r.getString(2))).toSeq
      assert(keys == keys.sorted, s"suggester order for '$input'")
      rows.foreach(r => assert(r.getLong(3) <= 2))
    }
    // each input is a high-frequency term minus its last char — the
    // source term is one edit away and must be suggested
    freq.foreach { t =>
      val rows = byInput(t.dropRight(1))
      assert(rows.exists(_.getString(2) == t),
        s"'${t.dropRight(1)}' must suggest '$t'")
    }
  }

  test("collapsed search: one best hit per source, counted inner hits") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.TextQueries.collapsedSearch(spark, dir)
      .collect()
    assert(out.nonEmpty && out.length <= 10)
    val sources = out.map(_.getString(0))
    assert(sources.distinct.length == sources.length,
      "collapse = at most one hit per source")
    val scores = out.map(_.getDouble(2)).toSeq
    assert(scores == scores.sorted.reverse)
    assert(out.forall(_.getLong(3) >= 1L))
    // the emitted doc really is its source's best: no other matching
    // doc of that source scores higher (checked via the un-collapsed
    // function-score-free scores of q51's pipeline at large k)
    val all = FullText.bm25TopK(graft.io.Tables.documents(spark, dir),
      "doc_id", "text", Seq("fast", "vector", "query"), k = 100000)
      .join(graft.io.Tables.documents(spark, dir)
        .select($"doc_id", $"source"), Seq("doc_id"))
      .collect().groupBy(_.getString(2))
    out.foreach { r =>
      val grp = all(r.getString(0))
      val best = grp.maxBy(g => (g.getDouble(1), -g.getLong(0)))
      assert(best.getLong(0) == r.getLong(1),
        s"source ${r.getString(0)} best-hit mismatch")
      assert(grp.length == r.getLong(3), "inner-hit count")
    }
  }

  test("spanNearCount: greedy minimal chains, m terms, in order only") {
    val d = docs(
      (1L, "alpha beta gamma end words"), // width 0
      (2L, "alpha beta pad gamma end"), // width 1
      (3L, "alpha pad pad beta gamma"), // width 2
      (4L, "gamma beta alpha end words"), // reversed — never
      (5L, "alpha beta words only here")) // no gamma
    def at(slop: Int) = d.select($"doc_id",
      FullText.spanNearCount(FullText.analyze($"text"),
        Seq("alpha", "beta", "gamma"), slop).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(at(0) == Map(1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 5L -> 0L))
    assert(at(2) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L, 5L -> 0L))
    // every qualifying start counts a span (greedy minimal end per start)
    val multi = docs((9L, "alpha beta gamma pad alpha pad beta gamma"))
      .select(FullText.spanNearCount(FullText.analyze($"text"),
        Seq("alpha", "beta", "gamma"), 1).as("n"))
      .head.getLong(0)
    assert(multi == 2L, s"expected spans at starts 0 and 4, got $multi")
  }

  test("spanNearTopK keeps only span-matching docs with phrase-as-term scores") {
    val d = docs(
      (1L, "alpha beta gamma end words"),
      (2L, "alpha beta pad gamma end"),
      (3L, "gamma beta alpha end words"))
    val out = FullText.spanNearTopK(d, "doc_id", "text",
      Seq("alpha", "beta", "gamma"), slop = 1)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.columns.toSeq == Seq("doc_id", "span_hits", "score"))
    assert(rows.toSet == Set((1L, 1L), (2L, 1L)), rows.mkString(","))
  }

  test("highlightRawText wraps raw-offset tokens, preserving the original text") {
    val out = docs((1L, "Fast, FASTER; fast-vector!"))
      .select(FullText.highlightRawText($"text",
        Seq("fast", "vector")).as("h"))
      .head.getString(0)
    assert(out == "<em>Fast</em>, FASTER; <em>fast</em>-<em>vector</em>!")
  }

  test("query-term filter sits below the first exchange (postings-only shuffle)") {
    val d = docs((1L, "a b"), (2L, "c d"))
    val plan = FullText.bm25TopK(d, "doc_id", "text", Seq("b"), k = 5)
      .queryExecution.executedPlan.toString
    // The Filter on the exploded term column must appear under the
    // first Exchange in at least one scan branch: Generate → Filter →
    // ... → Exchange, never Exchange → Filter(term).
    val gen = plan.linesIterator.toSeq
    val genIdx = gen.indexWhere(_.contains("Generate explode"))
    assert(genIdx >= 0, s"no explode in plan:\n$plan")
    val above = gen.take(genIdx)
    // lines above the Generate in the tree-string are its consumers;
    // find the nearest Exchange above and ensure a term-filter sits
    // between the Generate and that Exchange.
    val exIdx = above.lastIndexWhere(_.contains("Exchange"))
    assert(exIdx >= 0, s"no exchange above explode:\n$plan")
    assert(above.drop(exIdx).exists(l =>
      l.contains("Filter") || gen(genIdx).contains("Filter")),
      s"expected term filter between explode and exchange:\n$plan")
  }
}
