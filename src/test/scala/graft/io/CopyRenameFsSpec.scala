package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.ops.FullText

/** The bare-S3A posture, PINNED instead of assumed: on a store whose
  * rename is copy+delete, [[Layout.commitGeneration]]'s scaladoc
  * claims a crash mid-"rename" leaves a partially-copied finally-named
  * dir that (a) stays invisible — no `_COMMITTED` marker — and (b) is
  * reclaimed, with the previous generation serving unchanged. This
  * spec runs the lifecycle on [[CopyRenameFileSystem]] (`cprn://`,
  * also setTimes-blind) and injects the mid-copy crash the way
  * NoSetTimesFileSystem pinned the heartbeat claim. */
class CopyRenameFsSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val terms = Seq("fast", "vector", "query")

  test("generation commits survive a copy+delete rename store; a crash mid-copy stays invisible and is reclaimed") {
    spark.sparkContext.hadoopConfiguration.set("fs.cprn.impl",
      classOf[CopyRenameFileSystem].getName)
    val docs = graft.io.Tables.documents(spark, dir).limit(60)
    val idx = "cprn://" + java.nio.file.Files
      .createTempDirectory("cprn-idx").toFile.getAbsolutePath
    val lIdx = java.nio.file.Files
      .createTempDirectory("cprn-twin").toFile.getAbsolutePath
    val allDead = docs.limit(3).select($"doc_id")
      .collect().map(_.getLong(0)).toSeq
    // the clean lifecycle first: every staged->final rename of the
    // commit protocol runs as copy+delete, page-equal to local
    FullText.writeTextIndex(docs, "doc_id", "text", idx,
      storeTermVectors = true)
    FullText.writeTextIndex(docs, "doc_id", "text", lIdx,
      storeTermVectors = true)
    FullText.deleteFromTextIndex(spark, idx, Seq(allDead.head))
    FullText.deleteFromTextIndex(spark, lIdx, Seq(allDead.head))
    def page(i: String) = FullText.bm25SearchStored(spark, i, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(page(idx) == page(lIdx),
      "the commit protocol must be exact on a copy-rename store")
    assert(Layout.liveGeneration(spark, idx).contains(1L))
    // CRASH mid-copy of the gen-2 staged->final rename: one file
    // lands under the finally-named dir, then the "rename" dies —
    // the widened window the scaladoc documents
    val before = page(idx)
    CopyRenameFileSystem.crashStagedRenameAfterFiles = 1
    try {
      val e = intercept[Exception] {
        FullText.deleteFromTextIndex(spark, idx, Seq(allDead(1)))
      }
      assert(e.getMessage != null &&
        e.getMessage.contains("simulated crash mid-copy-rename"),
        s"the injected crash must surface (got $e)")
    } finally CopyRenameFileSystem.crashStagedRenameAfterFiles = -1
    // (a) the partial is INVISIBLE: no marker, the live generation
    // and every page unchanged
    val hfs = new Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(hfs.exists(new Path(s"$idx/gen-2")),
      "the crash must have left a partially-copied finally-named dir " +
        "(otherwise this pin is vacuous)")
    assert(!hfs.exists(new Path(s"$idx/gen-2/_COMMITTED")))
    assert(Layout.liveGeneration(spark, idx).contains(1L),
      "a partially-copied generation must never resolve as live")
    assert(page(idx) == before,
      "the previous generation must serve unchanged")
    // the leak is visible to the status face (partial final dir +
    // the intact token-suffixed staging the crashed rename left)
    assert(Layout.orphanedStaging(spark, idx).size == 2,
      "both crash leftovers must report as orphans")
    // (b) RECLAIMED: the replayed delete clears the partial, commits
    // gen-2 for real, and equals the local twin's same delete
    FullText.deleteFromTextIndex(spark, idx, Seq(allDead(1)))
    FullText.deleteFromTextIndex(spark, lIdx, Seq(allDead(1)))
    assert(Layout.liveGeneration(spark, idx).contains(2L))
    assert(page(idx) == page(lIdx),
      "the replayed commit over crash leftovers must equal the twin")
    assert(Layout.orphanedStaging(spark, idx).isEmpty,
      "the retire sweep must have reclaimed the crash leftovers")
    // the SIDE-DIR rename is a distinct crash state: compaction's
    // commit renames the staged folded dirs (postings-v<gen>.<token>
    // -> postings-v<gen>) BEFORE the gen dir — crash there leaves a
    // partially-copied finally-named side dir that no committed
    // manifest references
    val preFold = page(idx)
    val genBefore = Layout.liveGeneration(spark, idx)
    CopyRenameFileSystem.crashStagedRenameAfterFiles = 1
    try {
      val e = intercept[Exception] {
        FullText.compactTextIndex(spark, idx)
      }
      assert(e.getMessage != null &&
        e.getMessage.contains("simulated crash mid-copy-rename"))
    } finally CopyRenameFileSystem.crashStagedRenameAfterFiles = -1
    assert(Layout.liveGeneration(spark, idx) == genBefore,
      "a crashed side rename must not move the live generation")
    assert(page(idx) == preFold,
      "the unreferenced partial side dir must be invisible to search")
    // the replayed fold clears the partial (commitGeneration deletes
    // the final name before its rename) and both folds land exact
    FullText.compactTextIndex(spark, idx)
    FullText.compactTextIndex(spark, lIdx)
    assert(page(idx) == page(lIdx),
      "compaction must be exact on a copy-rename store")
    assert(!Layout.pathExists(spark, s"$idx/_mutation.lock") &&
      !Layout.pathExists(spark, s"$idx/_mutation.lock.hb"),
      "no lease artifact may outlive the mutations")
  }

  test("a swap rotation crashed mid-copy leaves the AMBIGUOUS trio: the next fold refuses, nothing is guessed at, operator resolution recovers") {
    // the band family commits by swap rotation (no generation
    // marker), and on a copy-rename store a crash inside either
    // rotation leg leaves base + .old + staging ALL present with a
    // DIFFERENT one partial depending on where the copy died — the
    // one crash state no automatic heal can resolve safely. The old
    // behavior read the base as live and the next fold enshrined
    // whatever it happened to hold; now every mutator stops loudly.
    spark.sparkContext.hadoopConfiguration.set("fs.cprn.impl",
      classOf[CopyRenameFileSystem].getName)
    val idx = "cprn://" + java.nio.file.Files
      .createTempDirectory("cprn-rot").toFile.getAbsolutePath
    Seq((1L, "a"), (2L, "b"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$idx/bands")
    Seq((9L, Seq("s"))).toDF("id", "sh")
      .write.parquet(s"$idx/shingles")
    val liveRows = spark.read.parquet(s"$idx/bands").count()
    // crash the FIRST file copy of rename-1 (bands -> bands.old):
    // bands stays complete (the delete leg never ran), bands.old is
    // a partial skeleton, bands.compact was fully staged pre-fence
    CopyRenameFileSystem.crashRotationRenameAfterFiles = 0
    try {
      val e = intercept[Exception] {
        graft.ops.Dedup.compactBandIndex(spark, idx)
      }
      assert(e.getMessage != null &&
        e.getMessage.contains("simulated crash mid-rotation-rename"),
        s"the injected rotation crash must surface (got $e)")
    } finally CopyRenameFileSystem.crashRotationRenameAfterFiles = -1
    assert(Layout.pathExists(spark, s"$idx/bands") &&
      Layout.pathExists(spark, s"$idx/bands.old") &&
      Layout.pathExists(spark, s"$idx/bands.compact"),
      "the crash must leave the ambiguous trio on disk")
    assert(spark.read.parquet(s"$idx/bands").count() == liveRows,
      "the live base must still serve (this crash point kept it)")
    // the refold heals before reading — and must REFUSE: from the
    // artifacts alone it cannot know WHICH of the three is partial
    val refuse = intercept[Layout.AmbiguousRotationException] {
      graft.ops.Dedup.compactBandIndex(spark, idx)
    }
    assert(refuse.getMessage.contains("Resolve manually"))
    // RunGc reports the ambiguity and touches none of the trio
    spark.conf.set("graft.index.gcRotationGraceMs", "0")
    val (reclaimed, _, healed, ambiguous) =
      try graft.tools.RunGc.run(spark, idx)
      finally spark.conf.unset("graft.index.gcRotationGraceMs")
    assert(ambiguous == 1 && reclaimed == 0 && healed == 0,
      s"GC must report, not resolve (got r=$reclaimed h=$healed a=$ambiguous)")
    // operator resolution: THIS crash point kept the base complete —
    // keep it, through the CLI arm (RunGc --resolve bands:keep-base)
    // instead of hand-run raw deletes on the store
    val actions =
      graft.tools.RunGc.resolve(spark, idx, "bands", "keep-base")
    assert(actions.size == 2 && actions.forall(_.startsWith("delete")) &&
      actions.exists(_.endsWith("bands.old")) &&
      actions.exists(_.endsWith("bands.compact")),
      s"keep-base must delete exactly the untrusted pair (got $actions)")
    graft.ops.Dedup.compactBandIndex(spark, idx)
    assert(spark.read.parquet(s"$idx/bands").count() == 2,
      "the re-run fold must dedup the kept base exactly")
  }
}
