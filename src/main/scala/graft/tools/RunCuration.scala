package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.Checkpoints
import graft.queries.PipelineQueries

/** CLI for the end-to-end curation sweep (q63) as a deployment would
  * run it: read the raw documents lake, run every hygiene pass, and
  * PERSIST the two artifacts a training-data run ships —
  *
  *   <outDir>/stages/   per-stage (stage, n_docs, total_tokens) rows
  *                      (the dataset card)
  *   <outDir>/corpus/   the final curated corpus
  *                      (doc_id, text, n_tokens), written
  *                      PARTITIONED BY split — train/val/test land in
  *                      their own directories, so a training job's
  *                      reader prunes to its split at the file level
  *                      (the same partition-pruning contract as
  *                      io/Layout's bucketed layouts).
  *   <outDir>/packing/  the q66 sequence-packing index over the
  *                      train split (doc_id, n_tokens, start_tok,
  *                      first_seq, n_seqs) — what a dataloader
  *                      slices fixed-length sequences by.
  *   <outDir>/quality/  q72's Naive-Bayes quality scores over the
  *                      CURATED corpus (doc_id, n_tokens, ll_target,
  *                      ll_other, pred) — model trained ONCE on the
  *                      raw lake's reference labels (src0–src4 play
  *                      Wikipedia), then applied to the survivors:
  *                      the train-once/score-curated deployment
  *                      shape of the classifier.
  *
  * Usage: `runMain graft.tools.RunCuration <sfDir> <outDir>
  *         [nllThreshold]`. Prints one JSON summary line (driver
  * convention). Both frames come from ONE stage chain; the single
  * consume frees every checkpointed stage frame after both writes
  * complete.
  */
object RunCuration {

  /** Testable body (RunCurationSpec drives it on the shared test
    * session — the RunIndexing main/run split). Returns the collected
    * stage rows.
    *
    * RESUMABLE: stage survivor frames persist under
    * `<outDir>/stage_frames/<stage>/` (the reference's per-stage
    * artifact discipline, runner.py:27-77) — a run killed after
    * stage k resumes from k+1 on the next invocation instead of
    * recomputing the completed stages
    * ([[PipelineQueries.curationSweepResumable]]; RunCurationSpec
    * pins the no-recompute accounting and stats identity), and the
    * POST-SWEEP artifacts follow the same rule — a resume that
    * rebuilt no stage keeps _SUCCESS-marked corpus/packing/quality
    * untouched (RunCurationSpec pins their mtimes across a no-op
    * re-run). Delete `stage_frames/` to force a from-scratch sweep
    * over refreshed input. */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      nllThreshold: Double = 3.43)
      : Array[org.apache.spark.sql.Row] = {
    val (stats, corpus, built) = PipelineQueries.curationSweepResumable(
      spark, sfDir, s"$outDir/stage_frames", nllThreshold)
    // Post-sweep artifact reuse — the stage-frame resume discipline
    // extended past the sweep: when the resume rebuilt NO stage, the
    // persisted corpus is bit-identical to what this invocation would
    // rewrite, so _SUCCESS-marked artifacts stand as-is (a no-op
    // re-run rewrites only the 12-row dataset card). Any rebuilt
    // stage invalidates the corpus and both its derivatives; a torn
    // artifact (dir without _SUCCESS) rebuilds individually from the
    // stored corpus.
    def complete(name: String) =
      graft.io.Layout.pathExists(spark, s"$outDir/$name/_SUCCESS")
    val keepCorpus = built.isEmpty && complete("corpus")
    val keepPacking = keepCorpus && complete("packing")
    val keepQuality = keepCorpus && complete("quality")
    // Stage frames live on disk now (resumable artifacts), so the
    // stats/corpus plans carry no checkpointed blocks of their own;
    // the consume keeps the hygiene contract for anything a stage
    // body may still leave behind.
    Checkpoints.consume(stats) { st =>
      if (!keepCorpus)
        corpus.selectExpr("doc_id", "rtext AS text",
            "rn_tokens AS n_tokens", "split")
          .write.mode("overwrite").partitionBy("split")
          .parquet(s"$outDir/corpus")
      // third artifact: the q66 packing index over the TRAIN split —
      // global token offsets / sequence spans a dataloader slices by,
      // derived from the corpus just written (file-level split prune)
      if (!keepPacking)
        PipelineQueries.sequencePackFrame(
            spark.read.parquet(s"$outDir/corpus")
              .where("split = 'train'")
              .selectExpr("doc_id", "n_tokens"))
          .write.mode("overwrite").parquet(s"$outDir/packing")
      // fourth artifact: NB quality scores over the curated corpus.
      // The model trains on the RAW lake (where the source labels
      // live — the curated corpus no longer carries them); the
      // checkpointed training token frame is reachable from the
      // scored plan's model side, so the consume below frees it.
      if (!keepQuality) locally {
        import org.apache.spark.sql.functions._
        val docs = graft.io.Tables.documents(spark, sfDir)
        val cls = (regexp_extract(col("source"), "(\\d+)$", 1)
          .cast("int") < 5).cast("int")
        val tkTrain = graft.ops.Classifier
          .tokenFrame(docs, "doc_id", "text", cls).localCheckpoint()
        val priors = docs.agg(
          sum(when(cls === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(cls === 0, 1L).otherwise(0L)).as("n0"))
        val probe = graft.ops.Classifier.tokenFrame(
          spark.read.parquet(s"$outDir/corpus"), "doc_id", "text", lit(0))
        Checkpoints.consume(graft.ops.Classifier.scoreNaiveBayes(
            probe, graft.ops.Classifier.trainNaiveBayes(tkTrain), priors))(
          _.write.mode("overwrite").parquet(s"$outDir/quality"))
      }
      val rows = st.collect()
      // the stats frame is 12 tiny rows — persist the COLLECTED copy
      // so the write doesn't re-evaluate the whole stage chain
      spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toSeq, 1), st.schema)
        .write.mode("overwrite").parquet(s"$outDir/stages")
      rows
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: RunCuration <sfDir> <outDir> [nllThreshold]")
    val Array(sfDir, outDir) = args.take(2)
    val nll = args.lift(2).flatMap(_.toDoubleOption).getOrElse(3.43)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val rows = run(spark, sfDir, outDir, nll)
      val byStage = rows.map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val kept = rows.filter(_.getString(0).startsWith("9_split_"))
        .map(_.getLong(1)).sum
      println(s"""{"raw_docs":${byStage("0_raw")._1},""" +
        s""""kept_docs":$kept,""" +
        s""""kept_tokens":${byStage("8_lm_filter")._2},""" +
        s""""stages":${rows.length},"out":"$outDir"}""")
    } finally spark.stop()
  }
}
