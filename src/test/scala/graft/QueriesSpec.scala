package graft

import graft.SparkSpecBase

/** Smoke-level invariants for the driver-facing query surface at
  * sf0.001: every query runs, returns rows, and its column set matches
  * what its DuckDB oracle would produce (column-name parity is what the
  * driver's hash compare keys on).
  */
class QueriesSpec extends SparkSpecBase {
  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("k-means-refined IVF recalls the brute-force nearest neighbor") {
    import graft.queries.SimilarityQueries
    val exact = SimilarityQueries.knnBruteForce(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    val approx = SimilarityQueries.kmeansIvfKnn(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    // 2-probe IVF is approximate: require the top hit and a majority
    // of the top-10 to survive the cell restriction
    assert(approx.head == exact.head)
    assert(exact.take(10).count(approx.toSet) >= 5,
      s"exact=$exact approx=$approx")
  }

  test("rescore: final = qw*first + rw*hits; only window rows are rescored") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.TextQueries.rescoreSearch(spark, dir)
      .collect()
    assert(out.nonEmpty)
    // score_mode total: recomputable from the emitted components
    out.foreach { r =>
      val first = r.getDouble(r.fieldIndex("score_first"))
      val hits = r.getLong(r.fieldIndex("phrase_hits"))
      val fin = r.getDouble(r.fieldIndex("score"))
      assert(math.abs(fin - (1.0 * first + 2.0 * hits)) < 1e-9,
        s"doc ${r.getLong(0)}")
    }
    // the rescorer genuinely engages at this SF (not a vacuous pin)
    assert(out.exists(r => r.getLong(r.fieldIndex("phrase_hits")) > 0),
      "no phrase hits in window")
    // window_size=1: ONLY the first-phase top hit can be rescored —
    // a phrase-rich doc ranked 2nd by BM25 must NOT re-enter
    val top1 = graft.queries.TextQueries
      .rescoreSearch(spark, dir, window = 1, k = 5).collect()
    val firstPhaseTop = graft.ops.FullText.bm25TopK(
      graft.io.Tables.documents(spark, dir), "doc_id", "text",
      Seq("fast", "vector", "query"), k = 1)
      .collect().head.getLong(0)
    assert(top1.map(_.getLong(0)).toSeq == Seq(firstPhaseTop),
      "rescoring must never resurrect docs outside the window")
  }

  test("multi-bench contamination: one pass equals B single-benchmark passes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val matrix = graft.queries.CurationQueries
      .multiBenchContamination(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(matrix.keySet == Set("bench_0", "bench_1", "bench_2"))
    // re-derive each suite with the single-benchmark operator (q57's
    // overlapReport) over the same corpus split
    val docs = graft.io.Tables.documentsDistributed(spark, dir)
      .select($"doc_id", graft.ops.Decontaminate
        .gramHashes(graft.ops.Dedup.tokens($"text")).as("grams"))
    val corpus = docs.filter($"doc_id" % 31 >= 3)
    for (b <- 0 until 3) {
      val rep = graft.ops.Decontaminate.overlapReport(
        corpus, docs.filter($"doc_id" % 31 === b), "doc_id", "grams")
        .agg(count(lit(1)), coalesce(sum($"n_hit"), lit(0L)))
        .collect().head
      assert(matrix(s"bench_$b") == ((rep.getLong(0), rep.getLong(1))),
        s"suite $b diverges from its standalone q57 run")
    }
  }

  test("bool query: must is AND, must_not excludes, filter restricts, should adds") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val hits = graft.queries.TextQueries.boolQuerySearch(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(hits.nonEmpty)
    val docs = graft.io.Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        graft.ops.FullText.analyze($"text").as("toks"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getSeq[String](2).toSet))).toMap
    hits.keys.foreach { id =>
      val (lang, toks) = docs(id)
      assert(toks.contains("scan") && toks.contains("column"),
        s"$id must contain every must term")
      assert(!toks.contains("merge"), s"$id must_not violated")
      assert(lang == "en", s"$id filter violated")
    }
    // the clauses genuinely engage on this corpus: some doc has both
    // must terms but is excluded by must_not or filter
    assert(docs.exists { case (id, (lang, toks)) =>
      toks.contains("scan") && toks.contains("column") &&
        (toks.contains("merge") || lang != "en") && !hits.contains(id)
    }, "fixture check: exclusion clauses must bite")
    // should is additive: dropping it never raises a score
    val noShould = graft.queries.TextQueries.boolQuerySearch(
      spark, dir, should = Seq.empty)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((id, s) <- noShould if hits.contains(id))
      assert(hits(id) >= s - 1e-9, s"should must only add score ($id)")
    assert(hits.exists { case (id, s) =>
      noShould.get(id).exists(s0 => s > s0 + 1e-9)
    }, "fixture check: should must bite for at least one hit")
  }

  test("curation sweep: stages only shrink, splits partition the final set") {
    import graft.queries.PipelineQueries
    val rows = graft.ops.Checkpoints.consume(
      PipelineQueries.curationSweep(spark, dir))(_.collect())
    val byStage = rows.map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val chain = Seq("0_raw", "1_quality", "2_repetition", "3_pii",
      "4_decontaminate", "5_exact_dedup", "6_near_dedup",
      "7_semantic_dedup", "8_lm_filter")
    chain.foreach(s => assert(byStage.contains(s), s"missing stage $s"))
    chain.sliding(2).foreach { case Seq(a, b) =>
      assert(byStage(a)._1 >= byStage(b)._1, s"$a -> $b grew docs")
      assert(byStage(a)._2 >= byStage(b)._2, s"$a -> $b grew tokens")
    }
    val splits = rows.filter(_.getString(0).startsWith("9_split_"))
    assert(splits.map(_.getLong(1)).sum == byStage("8_lm_filter")._1,
      "splits must partition the stage-8 survivors")
    assert(splits.map(_.getLong(2)).sum == byStage("8_lm_filter")._2)
  }

  test("phrase suggester: the true bigram survives with the max bigram count") {
    val rows = graft.queries.TextQueries.phraseSuggest(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    assert(rows.nonEmpty)
    // the corrupted input is one deletion from the true top bigram, so
    // the generator must recover it, and no candidate pair can beat
    // the corpus's most frequent bigram on bigram_count
    val maxCount = rows.map(_._2).max
    assert(rows.filter(_._2 == maxCount).nonEmpty && maxCount > 0,
      s"true bigram lost: ${rows.mkString(",")}")
  }

  test("shard plan: round-robin doc counts differ by at most one") {
    val rows = graft.queries.PipelineQueries.shardPlan(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 16)
    val counts = rows.map(_._2)
    assert(counts.max - counts.min <= 1,
      s"round-robin must balance docs exactly: ${counts.mkString(",")}")
  }

  test("budget select: kept tokens respect the budget and are non-empty") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.PipelineQueries.budgetSelect(spark, dir)
      .agg(sum("n_tokens"), sum("kept_tokens"), sum("n_kept")).head()
    val total = rows.getLong(0); val kept = rows.getLong(1)
    assert(rows.getLong(2) > 0, "selection must keep something")
    // the greedy cut admits the document that CROSSES the budget
    // (cum_before < B), so kept ≤ B + the largest single doc; pin the
    // sane bound kept < total and the budget-dominance kept >= B·ε
    val budget = (total * 0.25).toLong
    assert(kept >= (budget * 0.5) && kept < total,
      s"kept=$kept budget=$budget total=$total")
  }

  test("score explain: contributions sum to the q51 score of the top hit") {
    val top = graft.ops.FullText.bm25TopK(
      graft.io.Tables.documents(spark, dir), "doc_id", "text",
      Seq("fast", "vector", "query"), k = 1).head()
    val rows = graft.queries.TextQueries.scoreExplain(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(0) == top.getLong(0)),
      "explain must describe the top-ranked doc")
    val sum = rows.map(_.getDouble(6)).sum
    assert(math.abs(sum - top.getDouble(1)) < 5e-4,
      s"contributions $sum must reassemble the score ${top.getDouble(1)}")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      // DRIVER CONTRACT (round-9 lesson, q143): gated outputs are
      // SCALARS ONLY. The external harness loads results into pandas
      // and sorts rows — an array/map/struct cell raises "unhashable
      // type" and the query loses its green row even when the local
      // parity gate (string-repr sort) passes. Digest collections to
      // strings (concat_ws/md5) in BOTH engines.
      import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
      val complex = df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => f.name
      }
      assert(complex.isEmpty,
        s"$name emits non-scalar gated column(s) ${complex.mkString(",")}")
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }
}
