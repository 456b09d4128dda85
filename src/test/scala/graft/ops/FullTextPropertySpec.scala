package graft.ops

import graft.SparkSpecBase

/** Semantic invariants of BM25 over seeded pseudo-random corpora —
  * properties that must hold for ANY corpus, complementing
  * FullTextSpec's hand-computed pins. Score comparisons across two
  * separate runs use a 2e-4 tolerance (the engine rounds to 4dp and
  * double-sum order inside an aggregation is not pinned); ordering
  * assertions stay within a single result set.
  */
class FullTextPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "query",
    "vector", "fast", "slow", "table", "row")
  private val terms = Seq("query", "vector")

  private def corpus(seed: Int, n: Int = 120): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      i.toLong -> (1 to (3 + rnd.nextInt(40)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
  }

  private def run(docs: Seq[(Long, String)], k: Int = 200) =
    FullText.bm25TopK(docs.toDF("doc_id", "text"), "doc_id", "text",
      terms, k = k)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  private def assertSameScores(a: Seq[(Long, Double)],
      b: Seq[(Long, Double)]): Unit = {
    assert(a.map(_._1).toSet == b.map(_._1).toSet)
    val bm = b.toMap
    a.foreach { case (id, s) =>
      assert(math.abs(s - bm(id)) <= 2e-4, s"doc $id: $s vs ${bm(id)}")
    }
  }

  test("every returned doc contains a query term; ordering is total desc with id tiebreak") {
    val docs = corpus(11)
    val res = run(docs, k = 15)
    assert(res.length <= 15 && res.nonEmpty)
    val byId = docs.toMap
    res.foreach { case (id, s) =>
      assert(byId(id).split(" ").exists(terms.contains), s"doc $id")
      assert(s > 0.0)
    }
    val resorted = res.sortBy { case (id, s) => (-s, id) }
    assert(res == resorted)
  }

  test("bag-of-words: permuting each document's tokens changes nothing") {
    val base = corpus(23)
    val rnd = new scala.util.Random(42)
    val shuffled = base.map { case (id, t) =>
      id -> rnd.shuffle(t.split(" ").toSeq).mkString(" ") }
    assertSameScores(run(base), run(shuffled))
  }

  test("stopword insertion is an end-to-end no-op (never indexed, never counted in |D|)") {
    val base = corpus(37)
    val rnd = new scala.util.Random(5)
    val stops = FullText.englishStopwords.toVector
    val salted = base.map { case (id, t) =>
      id -> t.split(" ").flatMap { w =>
        if (rnd.nextInt(3) == 0) Seq(stops(rnd.nextInt(stops.size)), w)
        else Seq(w)
      }.mkString(" ") }
    assertSameScores(run(base), run(salted))
  }

  test("byte-identical documents score identically") {
    val base = corpus(53, n = 60)
    val dup = base :+ (999L -> base(7)._2) // 999 clones doc 7's text
    val res = run(dup).toMap
    if (res.contains(7L) || res.contains(999L)) {
      assert(res.contains(7L) && res.contains(999L))
      assert(math.abs(res(7L) - res(999L)) <= 2e-4)
    }
  }

  test("case and punctuation normalize away: upper-casing + commas keep scores") {
    val base = corpus(67)
    val noisy = base.map { case (id, t) =>
      id -> t.split(" ").map(_.toUpperCase).mkString(", ") }
    assertSameScores(run(base), run(noisy))
  }

  test("bestFragment is the true window argmax on any corpus") {
    val docs = corpus(71, n = 80)
    val window = 5
    val frags = docs.toDF("doc_id", "text")
      .select($"doc_id",
        FullText.bestFragment($"text", terms, window).as("frag"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getString(1))).toMap
    docs.foreach { case (id, text) =>
      // the fixture vocabulary contains no stopwords/punctuation, so
      // the analyzed stream IS the whitespace split
      val toks = text.split(" ").toVector
      val w = math.min(window, toks.length)
      val hits = (0 to toks.length - w).map(i =>
        toks.slice(i, i + w).count(terms.contains))
      val best = if (hits.isEmpty) 0 else hits.max
      frags(id) match {
        case None => assert(best == 0, s"doc $id: unmatched ⇔ null")
        case Some(f) =>
          // the emitted fragment wraps exactly `best` terms — the
          // argmax property — and is `w` tokens long
          assert(f.split(" ").length == w, s"doc $id fragment width")
          assert("<em>".r.findAllIn(f).size == best,
            s"doc $id: fragment hit count ${f} vs $best")
      }
    }
  }

  test("multi_match invariants on any two-field corpus: most = Σ legs, best ∈ [max leg, most]") {
    val docs = corpus(79, n = 80)
    val fielded = docs.map { case (id, t) =>
      val words = t.split(" ")
      (id, words.take(4).mkString(" "), t)
    }.toDF("doc_id", "title", "body")
    val out = FullText.bm25MultiFieldTopK(fielded, "doc_id",
      Seq("title" -> 2.0, "body" -> 1.0), terms, k = 500,
      tieBreaker = 0.3)
      .collect().map(r =>
        r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    def leg(c: String, boost: Double): Map[Long, Double] =
      FullText.bm25TopK(fielded, "doc_id", c, terms, k = 500)
        .collect().map(r => r.getLong(0) -> boost * r.getDouble(1)).toMap
    val t = leg("title", 2.0); val b = leg("body", 1.0)
    assert(out.nonEmpty)
    out.foreach { case (id, (best, most)) =>
      val legs = Seq(t.get(id), b.get(id)).flatten
      assert(legs.nonEmpty, s"doc $id fused without any matching leg")
      assert(math.abs(most - legs.sum) <= 4e-4, s"doc $id most_fields")
      val mx = legs.max
      assert(best >= mx - 2e-4 && best <= most + 2e-4,
        s"doc $id best_fields $best outside [max=$mx, most=$most]")
    }
  }
}
