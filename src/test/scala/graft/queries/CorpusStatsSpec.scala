package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.ops.{Classifier, Dedup}

/** Round-8 late corpus-statistics surface: Naive-Bayes quality
  * classification (q72), DSIR importance weights (q73), per-source KL
  * drift (q74), BPE pair-merge counts (q75), normalization-aware
  * exact dedup (q76), and TF-IDF top terms (q77). Fixture tests pin
  * the operator math on constructed inputs; sf0.001 tests pin the
  * query-level invariants the oracles rely on.
  */
class CorpusStatsSpec extends SparkSpecBase {
  private val dir = "/root/testdata/sf0.001"

  test("NB classifier: class-distinctive tokens drive the arg-max") {
    import spark.implicits._
    val docs = Seq(
      (1L, "wiki wiki encyclopedia", 1),
      (2L, "wiki encyclopedia facts", 1),
      (3L, "spam click buy", 0),
      (4L, "buy spam now", 0),
      (5L, "encyclopedia facts wiki", 1),
      (6L, "click now buy", 0)).toDF("doc_id", "text", "cls")
    val tk = Classifier.tokenFrame(docs, "doc_id", "text", col("cls"))
    val priors = Seq((3L, 3L)).toDF("n1", "n0")
    val out = Classifier
      .scoreNaiveBayes(tk, Classifier.trainNaiveBayes(tk), priors)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    Seq(1L, 2L, 5L).foreach(id =>
      assert(out(id).getLong(4) == 1L, s"doc $id should classify target"))
    Seq(3L, 4L, 6L).foreach(id =>
      assert(out(id).getLong(4) == 0L, s"doc $id should classify other"))
    // log-likelihoods of a product of probabilities are negative
    out.values.foreach { r =>
      assert(r.getDouble(2) < 0d && r.getDouble(3) < 0d)
    }
  }

  test("NB classifier: empty documents drop out instead of scoring") {
    import spark.implicits._
    val docs = Seq((1L, "a b", 1), (2L, "", 0), (3L, "a c", 0))
      .toDF("doc_id", "text", "cls")
    val tk = Classifier.tokenFrame(docs, "doc_id", "text", col("cls"))
    val out = Classifier.scoreNaiveBayes(tk,
      Classifier.trainNaiveBayes(tk), Seq((1L, 2L)).toDF("n1", "n0"))
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L))
  }

  test("DSIR: target-heavy buckets score positive, raw-heavy negative") {
    import spark.implicits._
    val feats = Seq(
      (1L, 1, 5L), (1L, 1, 5L), // target doc, bucket 5
      (2L, 0, 7L), (2L, 0, 7L), // raw doc, bucket 7
      (10L, 0, 5L),             // raw doc whose features look target-like
      (11L, 0, 7L)).toDF("doc_id", "cls", "b")
    val ratios = Classifier.dsirLogRatios(feats, 1024)
    val out = Classifier.dsirWeights(
      feats.filter($"cls" === 0).select($"doc_id", $"b"), ratios)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(2L, 10L, 11L))
    assert(out(10L).getDouble(2) > 0d && out(10L).getLong(3) == 1L)
    assert(out(2L).getDouble(2) < 0d && out(2L).getLong(3) == 0L)
    assert(out(11L).getDouble(2) < 0d && out(11L).getLong(3) == 0L)
  }

  test("featureBucket stays in range and is deterministic") {
    import spark.implicits._
    val b = Seq("alpha bravo", "charlie delta", "alpha bravo").toDF("g")
      .select(Classifier.featureBucket(col("g"), 64).as("b"))
      .collect().map(_.getLong(0))
    assert(b.forall(x => x >= 0 && x < 64))
    assert(b(0) == b(2))
  }

  test("q74 source drift: KL is non-negative per source") {
    val rows = TextQueries.sourceDrift(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // fixed-point rounding of per-term contributions can dip a
      // hair below zero on a near-identical distribution
      assert(r.getDouble(3) >= -0.001, s"KL < 0 for ${r.getString(0)}")
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
    }
  }

  test("q75 BPE pairs: two-char pairs, descending counts") {
    val rows = TextQueries.bpePairMerge(spark, dir).collect()
    assert(rows.length == 20)
    rows.foreach(r => assert(r.getString(0).length == 2))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) >= b.getLong(1))
    case _ => ()
    }
  }

  test("normalizeText erases case, punctuation, digits, whitespace runs") {
    import spark.implicits._
    val out = Seq("  Hello,  WORLD!! 42\tfoo\n", "hello world foo")
      .toDF("t").select(Dedup.normalizeText(col("t")).as("n"))
      .collect().map(_.getString(0))
    assert(out(0) == "hello world foo")
    assert(out(0) == out(1))
  }

  test("q76: every synthetic clone resolves to its original") {
    val rows = DedupQueries.normalizedDedup(spark, dir).collect()
    val clones = rows.filter(_.getLong(3) == 1L)
    assert(clones.nonEmpty)
    clones.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) - 1000000L,
        s"clone ${r.getLong(0)} canonical ${r.getLong(1)}")
      assert(r.getLong(2) == 0L, "clones are never kept")
    }
    // originals of clones survive as their group's canonical
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    clones.foreach(r => assert(byId(r.getLong(0) - 1000000L).getLong(2) == 1L))
  }

  test("q77 TF-IDF: ranks are 1..k with non-increasing scores per doc") {
    val rows = TextQueries.tfidfTopTerms(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (id, rs) =>
      val sorted = rs.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq == (1L to sorted.length).toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(3) >= b.getDouble(3),
          s"doc $id scores increase with rank")
        case _ => ()
      }
    }
  }

  test("q78 embedding outliers: flag tracks the rounded-cosine boundary") {
    val rows = SimilarityQueries.embeddingOutliers(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) >= -1.0001 && r.getDouble(2) <= 1.0001)
      assert(r.getLong(3) == (if (r.getDouble(2) < 0.0) 1L else 0L))
    }
  }

  test("q78 embedding outliers: identical vectors are never outliers") {
    import spark.implicits._
    val e = Seq(
      (0L, Array(1f, 0f, 0f), 0), (1L, Array(1f, 0f, 0f), 0),
      (2L, Array(-1f, 0f, 0f), 0), // anti-correlated with its label
      (3L, Array(0f, 1f, 0f), 1), (4L, Array(0f, 1f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val tmp = java.nio.file.Files.createTempDirectory("emb").toString
    e.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = SimilarityQueries.embeddingOutliers(spark, tmp)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getLong(3) == 0L && out(1L).getLong(3) == 0L)
    assert(out(2L).getLong(3) == 1L, "anti-correlated vector must flag")
    assert(out(3L).getLong(3) == 0L && out(4L).getLong(3) == 0L)
  }

  test("q79 Zipf slope: single row, negative slope on natural ranking") {
    val rows = TextQueries.zipfSlope(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) > 0)
    assert(r.getDouble(1) < 0d, "frequency must fall with rank")
  }

  test("q79 Zipf slope: exact power law recovers its exponent") {
    import spark.implicits._
    // freq = 1000 / rank  =>  ln f = ln 1000 - 1 * ln r: slope -1
    val docs = (1 to 5).flatMap(r =>
      Seq.fill(1000 / r)((s"w$r"))).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("zipf").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = TextQueries.zipfSlope(spark, tmp).collect().head
    assert(math.abs(r.getDouble(1) + 1.0) < 0.02,
      s"slope ${r.getDouble(1)} should be ~-1")
  }

  test("q80 near-dup accounting: sources are ordered, counts positive") {
    val rows = DedupQueries.nearDupBySource(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getString(0) <= r.getString(1), "source pair must be ordered")
      assert(r.getLong(2) > 0)
      assert(r.getDouble(3) >= 0.7, "verified pairs sit above threshold")
    }
  }

  test("q81 fertility: ratio consistent with its own sums") {
    val rows = TextQueries.tokenizerFertility(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expected = BigDecimal(
        r.getLong(2).toDouble / r.getLong(3))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(4) == expected)
      assert(r.getDouble(4) >= 1.0,
        "BPE pretokens can never undercut whitespace words on word soup")
    }
  }

  test("q82 calibration: identical docs land in the top bucket with zero error") {
    import spark.implicits._
    import graft.ops.Dedup
    val docs = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot"),
      (2L, "alpha bravo charlie delta echo foxtrot"), // exact dup
      (3L, "alpha bravo charlie delta echo golf"))    // near dup
      .toDF("doc_id", "text")
      .select($"doc_id", Dedup.shingles(Dedup.tokens($"text")).as("sh"))
    val rows = Dedup.minhashCalibration(docs, "doc_id", "sh").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 9)
      assert(r.getDouble(2) >= 0d && r.getDouble(2) <= 1d)
      assert(r.getDouble(3) >= 0d)
    }
    val top = rows.find(_.getLong(0) == 9L)
    assert(top.isDefined, "the exact-dup pair must land in bucket 9")
    assert(top.get.getDouble(3) <= 0.5,
      "identical docs cannot have large estimator error")
  }

  test("q82 calibration runs at sf0.001 with sane buckets") {
    val rows = DedupQueries.minhashCalibrationReport(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  test("q83 markup filter: injected markup drives the flags") {
    import graft.queries.CurationQueries
    val rows = CurationQueries.markupFilter(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    rows.foreach { case (id, r) =>
      val (tags, fences, links) = (r.getLong(2), r.getLong(3), r.getLong(4))
      // <div ...>, <a ...>, </a>, </div>
      if (id % 3 == 0) assert(tags == 4L, s"doc $id tags=$tags")
      else assert(tags == 0L)
      assert(fences == (if (id % 7 == 0) 2L else 0L))
      assert(links == (if (id % 5 == 0) 1L else 0L))
      val keep = r.getLong(6)
      if (id % 3 == 0 || id % 7 == 0) assert(keep == 0L,
        s"marked-up doc $id must drop")
      else assert(keep == 1L, s"clean doc $id must keep")
    }
  }

  test("q84 funnel: stages only shrink and latencies are non-negative") {
    val rows = Relational.conversionFunnel(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("1_view", "2_click", "3_purchase"))
    val counts = rows.map(_.getLong(1))
    assert(counts(0) >= counts(1) && counts(1) >= counts(2),
      "a strict funnel can never grow")
    assert(rows(0).getDouble(2) == 0.0)
    rows.drop(1).foreach(r => assert(r.getDouble(2) >= 0d))
  }

  test("q84 funnel: ordering is strict (click before view doesn't count)") {
    import spark.implicits._
    import java.sql.Timestamp
    val ev = Seq(
      // user 1: proper view -> click -> purchase
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), "view"),
      (1L, Timestamp.valueOf("2024-01-01 00:10:00"), "click"),
      (1L, Timestamp.valueOf("2024-01-01 00:20:00"), "purchase"),
      // user 2: click BEFORE view — converts at view only
      (2L, Timestamp.valueOf("2024-01-01 00:10:00"), "click"),
      (2L, Timestamp.valueOf("2024-01-01 00:20:00"), "view"))
      .toDF("user_id", "ts", "event_type")
      .select($"user_id", $"event_type",
        unix_micros($"ts").as("us"))
    // replicate the stage chain on the fixture
    val tv = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"us").as("t1"))
    val tc = ev.filter($"event_type" === "click").join(tv, Seq("user_id"))
      .filter($"us" > $"t1").groupBy($"user_id")
      .agg(min($"us").as("t2"))
    assert(tv.count() == 2L)
    assert(tc.collect().map(_.getLong(0)).toSeq == Seq(1L),
      "user 2's pre-view click must not convert")
  }

  test("q85 retention: offset 0 exists per cohort and bounds hold") {
    val rows = Relational.retentionCohorts(spark, dir).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getString(0))
    byCohort.foreach { case (c, rs) =>
      val offsets = rs.map(_.getLong(1)).toSet
      assert(offsets.contains(0L), s"cohort $c missing day-0 row")
      assert(offsets.forall(o => o >= 0L && o <= 7L))
      val day0 = rs.find(_.getLong(1) == 0L).get.getLong(2)
      rs.foreach(r => assert(r.getLong(2) <= day0,
        s"cohort $c retains more users than it started with"))
    }
  }

  test("q86 lexical diversity: degenerate repetition scores zero entropy") {
    import spark.implicits._
    val docs = Seq((1L, "a a a a"), (2L, "a b c d"), (3L, "a a b b"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("lexdiv").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextQueries.lexicalDiversity(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    // all-same tokens: one type, TTR 1/4, entropy exactly 0
    assert(out(1L).getLong(2) == 1L && out(1L).getDouble(3) == 0.25)
    assert(out(1L).getDouble(4) == 0.0)
    // all-distinct: TTR 1, entropy ln 4
    assert(out(2L).getDouble(3) == 1.0)
    assert(math.abs(out(2L).getDouble(4) - math.log(4d)) < 1e-3)
    // two balanced types: entropy ln 2
    assert(math.abs(out(3L).getDouble(4) - math.log(2d)) < 1e-3)
  }

  test("q86 lexical diversity runs at sf0.001 with sane bounds") {
    val rows = TextQueries.lexicalDiversity(spark, dir).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "types cannot exceed tokens")
      val ttr = r.getDouble(3)
      assert(ttr > 0d && ttr <= 1.0)
      // entropy is bounded by ln(n_types)
      assert(r.getDouble(4) >= -1e-4 &&
        r.getDouble(4) <= math.log(r.getLong(2).toDouble) + 1e-4)
    }
  }

  test("q87 PMI: an exclusive adjacent pair outranks an independent one") {
    import spark.implicits._
    // 'new york' always adjacent and exclusive; 'the cat' co-occurs but
    // both words also appear everywhere else, diluting the ratio
    val phrase = Array.fill(6)("new york").mkString(" ")
    val noise = Array.fill(6)("the cat the dog the fish").mkString(" ")
    val docs = Seq((1L, phrase), (2L, noise), (3L, noise))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("pmi").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextQueries.pmiCollocations(spark, tmp, minCount = 5)
      .collect()
    val byPair = out.map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(byPair.contains("new york"))
    assert(out.head.getString(0) == "new york",
      "the exclusive collocation must rank first")
    byPair.get("the cat").foreach(p =>
      assert(p < byPair("new york")))
  }

  test("q87 PMI runs at sf0.001 honoring the min-count prune") {
    val rows = TextQueries.pmiCollocations(spark, dir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(1) >= 5L, "min-count prune violated")
      assert(r.getLong(2) >= r.getLong(1) && r.getLong(3) >= r.getLong(1),
        "a bigram cannot outnumber its unigrams")
    }
    // descending by rounded PMI with pair-name tiebreak
    val keys = rows.map(r => (-r.getDouble(4), r.getString(0))).toSeq
    assert(keys == keys.sorted)
  }

  test("q88 URL domains: injected construction drives counts and blocklist") {
    val rows = CurationQueries.urlDomainReport(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    // five content domains + the tracker
    assert(rows.keySet == Set("site0.example", "site1.example",
      "site2.example", "site3.example", "site4.example", "ads.example"))
    // even doc_ids 0..498: site{id mod 5}.example, one URL per doc
    rows.foreach { case (d, r) =>
      assert(r.getLong(1) == r.getLong(2),
        s"$d: one injected URL per document")
    }
    assert(rows("ads.example").getLong(3) == 1L, "tracker must be flagged")
    rows.filterKeys(_ != "ads.example").values.foreach(r =>
      assert(r.getLong(3) == 0L))
    // doc_id ≡ 0 mod 11 in 0..499 → 46 tracker docs
    assert(rows("ads.example").getLong(1) == 46L)
    // even ids with id%5==0 are ids ≡ 0 mod 10 → 50 docs
    assert(rows("site0.example").getLong(1) == 50L)
  }

  test("q89 containment runs at sf0.001: containment dominates jaccard") {
    val rows = DedupQueries.containmentDedup(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getDouble(2)
      val ca = r.getDouble(3); val cb = r.getDouble(4)
      assert(math.max(ca, cb) >= 0.5)
      assert(ca >= j - 1e-9 && cb >= j - 1e-9)
    }
  }

  test("q77 TF-IDF: a corpus-rare term outranks corpus-common ones") {
    import spark.implicits._
    // doc 1 holds the only occurrence of 'zebra'; 'the' is everywhere
    val docs = Seq((1L, "the the zebra the"), (2L, "the a b"),
      (3L, "the a c")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("tfidf").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val top = TextQueries.tfidfTopTerms(spark, tmp, k = 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top(1L) == "zebra")
  }
}
