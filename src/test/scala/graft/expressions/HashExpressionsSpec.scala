package graft.expressions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.ops.{Dedup, TextAnalysis}

/** Bit-parity pins for the compiled text-hash kernels against their
  * interpreted higher-order-function twins — the HOF forms are the
  * semantic source of truth the DuckDB oracles replicate, so any
  * kernel drift would surface here before it surfaced in the
  * correctness gate. */
class HashExpressionsSpec extends SparkSpecBase {

  /** Texts covering the edge cases: empty, whitespace-only, shorter
    * than shingle/gram width, unicode, repeated tokens, punctuation,
    * mixed case, plus pseudo-random token soup. */
  private def corpus: Seq[String] = {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("the", "cat", "sat", "on", "a", "mat", "Über",
      "naïve", "東京", "x", "don't", "co-op", "3.14", "MIXED", "Case")
    val random = (1 to 80).map { _ =>
      (1 to (1 + rnd.nextInt(60))).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    Seq("", " ", "\t\n  ", "one", "two tokens", "three token doc",
      "four token document here", "Tab\tand\nnewline  splits",
      "ÜBER Naïve 東京 équipe", "dup dup dup dup dup",
      "punct, punct! punct? (punct)") ++ random
  }

  private def df = {
    import spark.implicits._
    corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text").repartition(4)
  }

  private def assertColsEqual(native: org.apache.spark.sql.Column,
      hof: org.apache.spark.sql.Column): Unit = {
    val rows = df.select(native.as("a"), hof.as("b")).collect()
    rows.foreach { r: Row => assert(r.get(0) == r.get(1), r.toString) }
  }

  test("whitespaceTokens == filter(split(lower))") {
    assertColsEqual(Dedup.tokens(col("text")), Dedup.tokensHof(col("text")))
  }

  test("tokenShingles == distinct transform/slice form") {
    assertColsEqual(
      Dedup.shingles(Dedup.tokensHof(col("text"))),
      Dedup.shinglesHof(Dedup.tokensHof(col("text"))))
  }

  test("minhashSignature == per-element HOF md5 minima") {
    val sh = Dedup.shinglesHof(Dedup.tokensHof(col("text")))
    assertColsEqual(
      Dedup.minhashSignature(sh), Dedup.minhashSignatureHof(sh))
  }

  test("minhashBands == HOF band digests") {
    val sh = Dedup.shinglesHof(Dedup.tokensHof(col("text")))
    assertColsEqual(
      Dedup.bandHashesDirect(sh), Dedup.bandHashesDirectHof(sh))
  }

  test("simhash32 == single-fold vote accumulator") {
    val toks = Dedup.tokensHof(col("text"))
    assertColsEqual(Dedup.simhash32(toks), Dedup.simhash32Hof(toks))
  }

  test("simhash64 halves == simhash32 kernel (high) + offset-9 HOF (low)") {
    // The 64-bit fingerprint's per-token hash is md5 hex chars 1..16
    // big-endian, so bits 32..63 vote on chars 1..8 (≡ simhash32) and
    // bits 0..31 on chars 9..16 (≡ the HOF twin at hexOffset = 9).
    // Both halves together pin every vote of the 64-bit kernel.
    val toks = Dedup.tokensHof(col("text"))
    assertColsEqual(
      shiftrightunsigned(Dedup.simhash64(toks), 32), Dedup.simhash32(toks))
    assertColsEqual(
      Dedup.simhash64(toks).bitwiseAND(lit(0xffffffffL)),
      Dedup.simhash32Hof(toks, hexOffset = 9))
  }

  test("simhash64 matches an independent MessageDigest vote count") {
    import spark.implicits._
    // Hand-rolled reference: same algorithm, written against
    // java.security directly rather than the kernel's ArrayData loop.
    def expected(tokens: Seq[String]): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val votes = new Array[Int](64)
      tokens.foreach { t =>
        val d = md.digest(t.getBytes("UTF-8"))
        val h = (0 until 8).foldLeft(0L)((acc, b) => (acc << 8) | (d(b) & 0xffL))
        (0 until 64).foreach(i =>
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1)
      }
      (0 until 64).foldLeft(0L)((acc, i) =>
        if (votes(i) > 0) acc | (1L << i) else acc)
    }
    val docs = Seq(
      Seq("the", "cat", "sat"), Seq("a"), Seq("dup", "dup", "dup"),
      Seq("Über", "東京"), (1 to 40).map(i => s"tok$i"))
    val got = docs.map(_.toArray).toDF("toks").repartition(2)
      .select(Dedup.simhash64(col("toks"))).collect().map(_.getLong(0))
    // Row order survives: repartition(2) is round-robin but collect
    // order is partition-major — compare as multisets to be safe.
    assert(got.sorted.toSeq == docs.map(expected).sorted)
    // Bit 63 is exercised somewhere in the fixture (negative Long).
    assert(docs.map(expected).exists(_ < 0L))
  }

  test("kgramMd5 == positional md5 HOF") {
    val toks = Dedup.tokensHof(col("text"))
    assertColsEqual(
      TextAnalysis.kgramHashes(toks), TextAnalysis.kgramHashesHof(toks))
  }

  test("winnowMin == distinct window-min HOF") {
    val hashes = TextAnalysis.kgramHashesHof(Dedup.tokensHof(col("text")))
    assertColsEqual(
      TextAnalysis.winnowFingerprints(hashes),
      TextAnalysis.winnowFingerprintsHof(hashes))
  }

  test("arrayJaccard == size(intersect)/size(union) incl. empty arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val rows = (1 to 60).map { _ =>
      ((1 to 1 + rnd.nextInt(7)).map(_ => vocab(rnd.nextInt(8))).distinct,
        (1 to rnd.nextInt(8)).map(_ => vocab(rnd.nextInt(8))).distinct)
    } :+ ((Seq("a"), Seq.empty[String])) // both-empty is unreachable:
    // the ANSI builtin raises DIVIDE_BY_ZERO, the kernel returns null
    val rows2 = rows.map { case (a, b) => (a.toArray, b.toArray) }
    val out = rows2.toDF("a", "b").repartition(3)
      .select(Dedup.jaccard(col("a"), col("b")).as("k"),
        Dedup.jaccardHof(col("a"), col("b")).as("h"))
      .collect()
    out.foreach(r => assert(r.get(0) == r.get(1), r.toString))
  }

  test("kernel parity holds across parameter edges (k=1, w=1, odd bands)") {
    val toks = Dedup.tokensHof(col("text"))
    for (k <- Seq(1, 2, 5)) {
      assertColsEqual(
        Dedup.shingles(toks, k), Dedup.shinglesHof(toks, k))
      assertColsEqual(
        TextAnalysis.kgramHashes(toks, k), TextAnalysis.kgramHashesHof(toks, k))
    }
    val sh = Dedup.shinglesHof(toks)
    for ((n, b) <- Seq((8, 2), (6, 3), (4, 4))) {
      assertColsEqual(
        Dedup.minhashSignature(sh, n), Dedup.minhashSignatureHof(sh, n))
      assertColsEqual(
        Dedup.bandHashesDirect(sh, n, b), Dedup.bandHashesDirectHof(sh, n, b))
    }
    val hashes = TextAnalysis.kgramHashesHof(toks)
    for (w <- Seq(1, 2, 7)) {
      assertColsEqual(
        TextAnalysis.winnowFingerprints(hashes, w),
        TextAnalysis.winnowFingerprintsHof(hashes, w))
    }
  }

  test("stopwordHits == size(filter(isInCollection))") {
    val en = TextAnalysis.stopwords.toMap.apply("en")
    assertColsEqual(
      TextAnalysis.stopwordHits(Dedup.tokensHof(col("text")), en)
        .cast("int"),
      TextAnalysis.stopwordHitsHof(Dedup.tokensHof(col("text")), en))
  }

  test("tokenLengthSum == aggregate fold over length") {
    assertColsEqual(
      TextAnalysis.tokenLengthSum(Dedup.tokensHof(col("text"))),
      TextAnalysis.tokenLengthSumHof(Dedup.tokensHof(col("text"))))
  }

  /** Interpreted twin of gramRepetitionStats: positional grams via
    * transform/slice, frequencies via nested filters. Quadratic per
    * row — the spec-only reference the compiled one-pass kernel is
    * pinned against. */
  private def repStatsHof(toks: org.apache.spark.sql.Column,
      n: Int): org.apache.spark.sql.Column = {
    val grams = when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))
    array(
      size(grams).cast("long"),
      coalesce(array_max(transform(array_distinct(grams),
        d => size(filter(grams, x => x === d)))), lit(0)).cast("long"),
      size(filter(grams,
        g => size(filter(grams, x => x === g)) > 1)).cast("long"))
  }

  test("gramRepetitionStats == nested-filter HOF across gram sizes") {
    val toks = Dedup.tokensHof(col("text"))
    for (n <- Seq(1, 2, 3, 5)) {
      assertColsEqual(
        TextHashes.gramRepetitionStats(toks, n), repStatsHof(toks, n))
    }
  }

  test("tokenGrams == strict transform/slice HOF (no short-doc collapse)") {
    val toks = Dedup.tokensHof(col("text"))
    for (n <- Seq(1, 2, 3, 5)) {
      val hof = when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
        .otherwise(array().cast("array<string>"))
      assertColsEqual(TextHashes.tokenGrams(toks, n), hof)
    }
  }

  test("null text propagates null through every kernel") {
    import spark.implicits._
    val nulls = Seq((1L, Option.empty[String])).toDF("id", "text")
    val row = nulls.select(
      Dedup.tokens($"text"),
      Dedup.minhashSignature(Dedup.shingles(Dedup.tokens($"text"))),
      Dedup.bandHashesDirect(Dedup.shingles(Dedup.tokens($"text"))),
      Dedup.simhash32(Dedup.tokens($"text")),
      TextAnalysis.kgramHashes(Dedup.tokens($"text")),
      TextHashes.gramRepetitionStats(Dedup.tokens($"text"), 2),
      TextAnalysis.winnowFingerprints(
        TextAnalysis.kgramHashes(Dedup.tokens($"text")))).head
    (0 until row.length).foreach(i => assert(row.isNullAt(i)))
  }

  test("ScalaCheck corpus: all kernels match HOF twins on arbitrary text") {
    import org.scalacheck.{Gen, rng}
    // arbitrary BMP chars (incl. controls, CJK, whitespace variants) —
    // both evaluation paths flow through the same UTF8String machinery,
    // so parity must hold on anything
    val charGen = Gen.frequency(
      5 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '\t', '\n', ' ', '　', ' '),
      2 -> Gen.choose('¡', 'ɏ'),
      1 -> Gen.choose('一', '鿿'),
      1 -> Gen.choose('', ''))
    val textGen = Gen.chooseNum(0, 120)
      .flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))
    val texts = (0 until 200).flatMap(i =>
      textGen(Gen.Parameters.default, rng.Seed(i.toLong)))
    import spark.implicits._
    val pdf = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text").repartition(4)
    val toks = Dedup.tokensHof(col("text"))
    val sh = Dedup.shinglesHof(toks)
    val rows = pdf.select(
      Dedup.tokens(col("text")).as("k_toks"), toks.as("h_toks"),
      Dedup.shingles(toks).as("k_sh"), Dedup.shinglesHof(toks).as("h_sh"),
      Dedup.minhashSignature(sh).as("k_sig"),
      Dedup.minhashSignatureHof(sh).as("h_sig"),
      Dedup.bandHashesDirect(sh).as("k_b"),
      Dedup.bandHashesDirectHof(sh).as("h_b"),
      Dedup.simhash32(toks).as("k_sim"), Dedup.simhash32Hof(toks).as("h_sim"),
      Dedup.simhash64(toks).as("k_s64"),
      // interpreted 64-bit twin: high half = the 32-bit HOF vote over
      // md5 chars 1-8, low half = the same fold at hexOffset 9
      shiftleft(Dedup.simhash32Hof(toks), 32)
        .bitwiseOR(Dedup.simhash32Hof(toks, hexOffset = 9)).as("h_s64"),
      TextAnalysis.kgramHashes(toks).as("k_kg"),
      TextAnalysis.kgramHashesHof(toks).as("h_kg")).collect()
    rows.foreach { r =>
      (0 until r.length by 2).foreach(i =>
        assert(r.get(i) == r.get(i + 1), s"col $i: ${r.get(i)} vs ${r.get(i + 1)}"))
    }
    assert(rows.length == texts.length)
  }

  test("kernels participate in whole-stage codegen plans") {
    import spark.implicits._
    val plan = spark.range(5)
      .select(concat(lit("w x y z "), $"id".cast("string")).as("text"))
      .select(Dedup.minhashSignature(
        Dedup.shingles(Dedup.tokens($"text"))).as("sig"))
      .queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[minhash_signature.*"),
      plan)
  }

  test("sloppyPhraseStats: hand-traced Lucene greedy fixtures") {
    import spark.implicits._
    // rows: per-slot SHIFTED position lists + slop, expected
    // [freq, matches] hand-traced from the published
    // SloppyPhraseMatcher algorithm (pop min / shrink matchLength /
    // emit 1/(matchLength+1) when the advancing slot overtakes next)
    def stats(lists: Seq[Seq[Int]], slop: Int): (Double, Double) = {
      val r = Seq(Tuple1(lists)).toDF("p")
        .select(graft.expressions.TextHashes
          .sloppyPhraseStats(col("p"), slop).as("s"))
        .head.getSeq[Double](0)
      (r(0), r(1))
    }
    // exact adjacent pair: one match at matchLength 0
    assert(stats(Seq(Seq(5), Seq(5)), 0) == (1.0, 1.0))
    // two exact occurrences: greedy finds both
    assert(stats(Seq(Seq(0, 5), Seq(0, 5)), 0) == (2.0, 2.0))
    // reversed adjacent pair costs matchLength 2
    assert(stats(Seq(Seq(1), Seq(-1)), 1) == (0.0, 0.0))
    assert(stats(Seq(Seq(1), Seq(-1)), 2) == (1.0 / 3, 1.0))
    // the A=[0,10], B=[2,3] trace: first match length 2, the second
    // alignment shrinks to 7 and only emits when slop allows it
    assert(stats(Seq(Seq(0, 10), Seq(2, 3)), 2) == (1.0 / 3, 1.0))
    assert(stats(Seq(Seq(0, 10), Seq(2, 3)), 7) ==
      (1.0 / 3 + 1.0 / 8, 2.0))
    // three slots, fully reversed: span 4
    assert(stats(Seq(Seq(2), Seq(0), Seq(-2)), 3) == (0.0, 0.0))
    assert(stats(Seq(Seq(2), Seq(0), Seq(-2)), 4) == (0.2, 1.0))
    // any empty slot or a single slot yields nothing
    assert(stats(Seq(Seq(1, 2), Seq()), 9) == (0.0, 0.0))
    assert(stats(Seq(Seq(1, 2)), 9) == (0.0, 0.0))
    // repeats rule: same-term slots never share a document position —
    // "echo echo echo" (slots shifted {0,1,2} / {-1,0,1}) emits the
    // exact pair once, the tail alignment exhausts in collision skips
    assert(stats(Seq(Seq(0, 1, 2), Seq(-1, 0, 1)), 1) == (1.0, 1.0))
  }

  test("sloppyPhraseStatsRpts: repeat-group advance, hand-traced fixtures") {
    import spark.implicits._
    def stats(lists: Seq[Seq[Int]], slop: Int,
        rpts: Boolean): (Double, Double) = {
      val r = Seq(Tuple1(lists)).toDF("p")
        .select(graft.expressions.TextHashes
          .sloppyPhraseStats(col("p"), slop, rpts).as("s"))
        .head.getSeq[Double](0)
      (r(0), r(1))
    }
    // "echo echo echo" vs query "echo echo": the doc contains the
    // phrase TWICE ((0,1) and (1,2) — Lucene scores freq 2). The
    // default mover-skips rule jumps the advancing slot past the
    // occupied middle position and finds only one; the repeat-group
    // advance EVICTS the occupant forward instead, keeping both.
    // Trace (shifted lists {0,1,2}/{-1,0,1}): init (0@d0, 1@d1);
    // advance s0→d1, eviction pushes s1→d2, emit ml=0; advance
    // s0→d2, eviction exhausts s1, final emit ml=0 → freq 2.
    assert(stats(Seq(Seq(0, 1, 2), Seq(-1, 0, 1)), 0, rpts = true)
      == (2.0, 2.0))
    assert(stats(Seq(Seq(0, 1, 2), Seq(-1, 0, 1)), 0, rpts = false)
      == (1.0, 1.0)) // the documented default-rule under-count
    // A at doc {1,2,10}, query "A A": the in-order alignment
    // (d2, d10) has cost 7. Mover-skips advances s0 OVER the
    // occupied d2 straight to d10 (only the crossed cost-9
    // alignment remains); repeat-group advance keeps s0 at d2 and
    // evicts s1 to d10. Trace: init (s0@d1, s1@d2), emit ml=0;
    // advance s0→d2 evicts s1→d10, window ml=7; exhaust, final
    // emit at slop ≥ 7.
    assert(stats(Seq(Seq(1, 2, 10), Seq(0, 1, 9)), 7, rpts = true)
      == (1.0 + 1.0 / 8, 2.0))
    assert(stats(Seq(Seq(1, 2, 10), Seq(0, 1, 9)), 7, rpts = false)
      == (1.0, 1.0))
    // both agree at slop 0 on that corpus (one exact match)
    assert(stats(Seq(Seq(1, 2, 10), Seq(0, 1, 9)), 0, rpts = true)
      == (1.0, 1.0))
    // THREE-slot repeat ("A A A"): pins that the emission check
    // compares against `next` CAPTURED at window formation — Lucene
    // reads pq.top().position once per window and does not refresh
    // it when advanceRpts evicts the slot that defined it.
    // Doc "A A A A" (shifted lists {0..3}/{-1..2}/{-2..1}): init
    // resolves to values (0,0,0); advancing s0→1 evicts s1→1 and
    // s2→1, and value(s0)=1 > captured next=0 emits the completed
    // (0,1,2) window; the (1,2,3) window emits at exhaustion —
    // Lucene's freq 2. (Refreshing next after the eviction would
    // suppress the first emission: freq 1, a real divergence.)
    assert(stats(Seq(Seq(0, 1, 2, 3), Seq(-1, 0, 1, 2),
      Seq(-2, -1, 0, 1)), 0, rpts = true) == (2.0, 2.0))
    // doc "A A A": exactly one alignment survives the evictions
    assert(stats(Seq(Seq(0, 1, 2), Seq(-1, 0, 1),
      Seq(-2, -1, 0)), 0, rpts = true) == (1.0, 1.0))
    // MULTI-GROUP repeats ("A B A B" — two same-term pairs): the
    // pairwise same-docPos eviction IS Lucene's simple-repeats rule
    // here, because slots of DIFFERENT terms can never occupy one
    // document position (one term per position), so collisions fire
    // exactly within each term's group — no bijection machinery
    // needed for single-term positions. Query slots A@0 B@1 A@2 B@3
    // over doc "a b a b a b" (A at 0,2,4; B at 1,3,5; shifted lists
    // below): Lucene finds the alignments at 0 and 2 → freq 2.
    assert(stats(Seq(Seq(0, 2, 4), Seq(0, 2, 4),
      Seq(-2, 0, 2), Seq(-2, 0, 2)), 0, rpts = true) == (2.0, 2.0))
    // doc "a b a b": exactly one alignment
    assert(stats(Seq(Seq(0, 2), Seq(0, 2),
      Seq(-2, 0), Seq(-2, 0)), 0, rpts = true) == (1.0, 1.0))
    // doc "a b x a b": the minimal window stretches by 1 (A@2→pos 3,
    // B@3→pos 4) — no match at slop 0, sloppy freq 1/2 at slop 1
    assert(stats(Seq(Seq(0, 3), Seq(0, 3),
      Seq(-2, 1), Seq(-2, 1)), 0, rpts = true) == (0.0, 0.0))
    assert(stats(Seq(Seq(0, 3), Seq(0, 3),
      Seq(-2, 1), Seq(-2, 1)), 1, rpts = true) == (0.5, 1.0))
    // collision-free inputs (distinct terms — the dominant case):
    // the two rules are IDENTICAL, pinned over the default test's
    // fixtures — which is why the default flag keeps every gated
    // hash unchanged
    for ((lists, slop) <- Seq(
      (Seq(Seq(5), Seq(5)), 0),
      (Seq(Seq(0, 5), Seq(0, 5)), 0),
      (Seq(Seq(1), Seq(-1)), 2),
      (Seq(Seq(0, 10), Seq(2, 3)), 2),
      (Seq(Seq(0, 10), Seq(2, 3)), 7),
      (Seq(Seq(2), Seq(0), Seq(-2)), 4)))
      assert(stats(lists, slop, rpts = true) ==
        stats(lists, slop, rpts = false),
        s"collision-free parity failed for $lists slop $slop")
  }

  test("highlightRaw: offsets in the raw text, tag-strip round-trip") {
    import spark.implicits._
    val terms = Seq("cat", "naïve", "東京", "r2")
    def hl(s: String): String =
      Seq(Tuple1(s)).toDF("t")
        .select(graft.expressions.TextHashes
          .highlightRaw(col("t"), terms).as("h"))
        .head.getString(0)
    // casing preserved inside tags; punctuation/whitespace untouched
    assert(hl("The Cat, sat; CAT!") == "The <em>Cat</em>, sat; <em>CAT</em>!")
    // unicode tokens and digit-letter tokens match whole-token only
    assert(hl("naïve café 東京, r2 r2d2") ==
      "<em>naïve</em> café <em>東京</em>, <em>r2</em> r2d2")
    // substrings inside larger tokens never match (concatenate ≠ cat)
    assert(hl("concatenate scatter") == "concatenate scatter")
    // property: stripping the tags round-trips to the raw text
    val texts = corpus ++ Seq("Cat cat CAT ,,, 東京東京 naïve-cat")
    texts.foreach { t =>
      val h = Seq(Tuple1(t)).toDF("t")
        .select(graft.expressions.TextHashes
          .highlightRaw(col("t"), terms).as("h"))
        .head.getString(0)
      assert(h.replace("<em>", "").replace("</em>", "") == t,
        s"round-trip failed for: $t")
    }
  }

  test("sloppyPhraseStats properties: slop-independent traversal on random lists") {
    import org.scalacheck.{Gen, rng}
    import spark.implicits._
    // The greedy traversal's alignment sequence does not depend on
    // slop — slop only gates emission — so on ANY input: matches and
    // freq are monotone nondecreasing in slop, freq ≤ matches, and a
    // large-enough slop (≥ global span) admits at least one match.
    val listsGen = for {
      m <- Gen.chooseNum(2, 4)
      ls <- Gen.listOfN(m, Gen.nonEmptyListOf(Gen.chooseNum(-8, 24))
        .map(_.distinct.sorted))
    } yield ls.map(_.toSeq).toSeq
    val cases = (0 until 60).flatMap(i =>
      listsGen(Gen.Parameters.default, rng.Seed(1000L + i)))
    val df = cases.zipWithIndex.map { case (ls, i) => (i, ls) }
      .toDF("i", "p")
    val slops = Seq(0, 1, 2, 4, 8, 64)
    val cols = slops.map(s =>
      graft.expressions.TextHashes.sloppyPhraseStats($"p", s).as(s"s$s"))
    df.select(cols: _*).collect().foreach { r =>
      val stats = slops.indices.map(j => r.getSeq[Double](j))
      stats.foreach { case Seq(freq, matches) =>
        assert(freq >= 0 && matches >= 0 && freq <= matches + 1e-9)
      }
      stats.sliding(2).foreach { case Seq(a, b) =>
        assert(a(1) <= b(1), s"matches must be monotone in slop: $stats")
        assert(a(0) <= b(0) + 1e-12, s"freq must be monotone in slop: $stats")
      }
      // span of the initial placements never exceeds 32+4 here, so
      // slop 64 always emits (non-empty collision-free init exists:
      // lists are distinct-sorted but same-docpos collisions can
      // exhaust a slot — allow the documented zero there)
      val Seq(f64, m64) = stats.last
      assert(m64 >= stats.head(1), "widest slop admits the most")
      assert(f64 >= 0 && m64 >= 0)
    }
  }

  test("SQL registration surface evaluates") {
    graft.Functions.register(spark)
    import spark.implicits._
    Seq(("a b c d e f", 1)).toDF("text", "n")
      .createOrReplaceTempView("hk_docs")
    val r = spark.sql(
      """SELECT minhash_signature(token_shingles(whitespace_tokens(text), 3), 16) AS sig,
        |  minhash_bands(token_shingles(whitespace_tokens(text), 3), 16, 4) AS bands,
        |  simhash32(whitespace_tokens(text)) AS sh,
        |  winnow_min(kgram_md5(whitespace_tokens(text), 4), 5) AS wm,
        |  highlight_raw(text, 'b,d') AS hl,
        |  sloppy_phrase_stats(array(array(0, 5), array(0, 5)), 0) AS sp
        |FROM hk_docs""".stripMargin).head
    assert(r.getSeq[String](0).size == 16)
    assert(r.getSeq[String](1).size == 4)
    assert(!r.isNullAt(2))
    assert(r.getSeq[String](3).nonEmpty)
    assert(r.getString(4) == "a <em>b</em> c <em>d</em> e f")
    assert(r.getSeq[Double](5) == Seq(2.0, 2.0))
    // the natural CSV spelling trims: 'b, d' highlights d, not ' d'
    val spaced = spark.sql(
      "SELECT highlight_raw(text, 'b, d,') AS hl FROM hk_docs").head
    assert(spaced.getString(0) == "a <em>b</em> c <em>d</em> e f")
  }
}
