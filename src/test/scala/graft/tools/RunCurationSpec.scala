package graft.tools

import java.nio.file.Files

import graft.SparkSpecBase

/** The curation CLI's artifact contract: a split-partitioned corpus
  * whose per-split counts MATCH the dataset-card stats, stats
  * readable back, and clean executor storage afterwards. */
class RunCurationSpec extends SparkSpecBase {

  test("writes split-partitioned corpus + stats that agree with each other") {
    import spark.implicits._
    val out = Files.createTempDirectory("curation-out").toFile.getAbsolutePath
    val before = graft.ops.Checkpoints.retainedRddIds(spark)
    val rows = RunCuration.run(spark, "/root/testdata/sf0.001", out)
    // consume freed the whole stage chain: nothing NEW may be
    // retained (subset, not equality — an earlier suite's async
    // non-blocking unpersist may legitimately REMOVE ids between the
    // two snapshots when the whole suite runs in one JVM)
    val leaked = graft.ops.Checkpoints.retainedRddIds(spark) -- before
    assert(leaked.isEmpty, s"stage frames leaked: $leaked")
    val byStage = rows.map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // corpus is physically partitioned by split — the reader sees the
    // split column from directory names and prunes at file level
    val corpus = spark.read.parquet(s"$out/corpus")
    assert(corpus.columns.toSet ==
      Set("doc_id", "text", "n_tokens", "split"))
    val perSplit = corpus.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((split, n) <- perSplit)
      assert(byStage(s"9_split_$split")._1 == n,
        s"stats/corpus disagree for $split")
    assert(perSplit.values.sum == byStage("8_lm_filter")._1)
    // partition directories exist on disk (physical pruning surface)
    for (s <- perSplit.keys)
      assert(new java.io.File(s"$out/corpus/split=$s").isDirectory)
    // the dataset card round-trips
    val stats = spark.read.parquet(s"$out/stages")
    assert(stats.count() == rows.length)
    assert(stats.columns.toSeq.sorted ==
      Seq("n_docs", "stage", "total_tokens"))
    // the packing index covers exactly the train split, with
    // contiguous global offsets summing to the split's token total
    val pack = spark.read.parquet(s"$out/packing")
    assert(pack.count() == byStage("9_split_train")._1)
    val packed = pack.orderBy($"doc_id").collect()
      .map(r => (r.getLong(2), r.getLong(1))) // (start_tok, n_tokens)
    var cum = 0L
    for ((start, n) <- packed) { assert(start == cum); cum += n }
    assert(cum == byStage("9_split_train")._2)
    // the quality artifact scores EXACTLY the curated survivors, with
    // non-null class log-likelihoods and a 0/1 pred
    val quality = spark.read.parquet(s"$out/quality")
    assert(quality.columns.toSeq.sorted ==
      Seq("doc_id", "ll_other", "ll_target", "n_tokens", "pred"))
    assert(quality.count() == byStage("8_lm_filter")._1)
    assert(quality.select($"doc_id").distinct().count() ==
      corpus.select($"doc_id").distinct().count())
    val qRows = quality.collect()
    qRows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("ll_target")) &&
        !r.isNullAt(r.fieldIndex("ll_other")))
      val p = r.getLong(r.fieldIndex("pred"))
      assert(p == 0L || p == 1L)
    }
  }

  test("no-op re-run reuses the post-sweep artifacts (corpus/packing/quality untouched)") {
    val out = Files.createTempDirectory("curation-reuse")
      .toFile.getAbsolutePath
    val rows1 = RunCuration.run(spark, "/root/testdata/sf0.001", out)
    def maxM(f: java.io.File): Long =
      if (f.isDirectory)
        (f.lastModified +: f.listFiles().toSeq.map(maxM)).max
      else f.lastModified
    val arts = Seq("corpus", "packing", "quality")
    val m1 = arts.map(n => n -> maxM(new java.io.File(s"$out/$n"))).toMap
    Thread.sleep(1100) // beat 1 s filesystem mtime granularity
    val rows2 = RunCuration.run(spark, "/root/testdata/sf0.001", out)
    for ((n, m) <- m1)
      assert(maxM(new java.io.File(s"$out/$n")) == m,
        s"$n was rewritten on a no-op re-run")
    def key(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(key(rows2) == key(rows1), "dataset card must be identical")
    // a torn derivative (packing lost its _SUCCESS) rebuilds ALONE —
    // corpus and quality stand
    assert(new java.io.File(s"$out/packing/_SUCCESS").delete())
    Thread.sleep(1100)
    RunCuration.run(spark, "/root/testdata/sf0.001", out)
    assert(maxM(new java.io.File(s"$out/corpus")) == m1("corpus"),
      "corpus must survive a packing-only rebuild")
    assert(maxM(new java.io.File(s"$out/quality")) == m1("quality"),
      "quality must survive a packing-only rebuild")
    assert(maxM(new java.io.File(s"$out/packing")) > m1("packing"),
      "torn packing must rebuild")
    assert(new java.io.File(s"$out/packing/_SUCCESS").exists())
  }

  private val allStages = Seq("s012_flags", "s3_pii", "s4_decontaminate",
    "s5_exact_dedup", "s6_near_dedup", "s7_semantic_dedup", "s8_lm_filter")

  test("resume: a sweep killed after stage k recomputes only stages > k, stats identical") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val stageDir = Files.createTempDirectory("curation-stages")
      .toFile.getAbsolutePath
    def collectStats(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // run 1: from scratch — every stage is BUILT and persisted
    val (stats1, _, built1) =
      graft.queries.PipelineQueries.curationSweepResumable(
        spark, sf, stageDir)
    val full = collectStats(stats1)
    assert(built1 == allStages, s"first run builds everything: $built1")
    for (s <- allStages)
      assert(new java.io.File(s"$stageDir/$s/_SUCCESS").exists())
    // simulate a kill right after s5 completed: later artifacts are
    // gone, and s6 died MID-WRITE (dir present, no _SUCCESS marker)
    def rmr(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmr); f.delete()
    }
    Seq("s6_near_dedup", "s7_semantic_dedup", "s8_lm_filter")
      .foreach(s => rmr(new java.io.File(s"$stageDir/$s")))
    val partial = new java.io.File(s"$stageDir/s6_near_dedup")
    partial.mkdirs()
    Files.writeString(java.nio.file.Paths.get(
      s"$stageDir/s6_near_dedup/part-orphan.parquet"), "torn write")
    // completed artifacts must not be rewritten — snapshot mtimes
    val mtimes = allStages.take(4).map(s =>
      s -> new java.io.File(s"$stageDir/$s").listFiles()
        .map(_.lastModified).max).toMap
    // run 2: resumes — builds ONLY the missing/partial tail
    val (stats2, corpus2, built2) =
      graft.queries.PipelineQueries.curationSweepResumable(
        spark, sf, stageDir)
    assert(built2 ==
      Seq("s6_near_dedup", "s7_semantic_dedup", "s8_lm_filter"),
      s"resume recomputed the wrong stages: $built2")
    for ((s, m) <- mtimes)
      assert(new java.io.File(s"$stageDir/$s").listFiles()
        .map(_.lastModified).max == m,
        s"completed stage $s was rewritten on resume")
    // identical final accounting, and the corpus agrees with it
    assert(collectStats(stats2) == full)
    assert(corpus2.count() == full("8_lm_filter")._1)
    // run 3: everything present — nothing recomputes at all
    val (stats3, _, built3) =
      graft.queries.PipelineQueries.curationSweepResumable(
        spark, sf, stageDir)
    assert(built3.isEmpty, s"no-op resume rebuilt: $built3")
    assert(collectStats(stats3) == full)
    // and the resumable stats match the one-shot gated sweep (q63)
    val oneShot = graft.ops.Checkpoints.consume(
        graft.queries.PipelineQueries.curationSweep(spark, sf))(_.collect())
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(full == oneShot, "resumable vs one-shot sweep stats differ")
  }
}
