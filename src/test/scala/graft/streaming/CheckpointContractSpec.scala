package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpecBase
import graft.io.CopyRenameFileSystem

/** THE CHECKPOINT RENAME CONTRACT, pinned: Spark's streaming WAL
  * (`HDFSMetadataLog` through `CheckpointFileManager`) commits each
  * offset/commit batch file BY RENAME — the engine's index artifacts
  * survive copy+delete-rename stores (staged token-unique generations,
  * markers, the injectable CAS publisher), but the WAL has no such
  * staging protocol, so a checkpoint dir on such a store has its own
  * crash window: a partially-copied batch file the restart reads as
  * corrupt. ObjectStoreStreamsSpec pins that `nost://` (atomic rename,
  * blind to everything else) carries a checkpoint fine and that
  * `cprn://` indexes work with a LOCAL checkpoint; this spec pins the
  * guard that keeps the remaining combination from shipping silently:
  * every stream constructor flags a checkpoint dir whose scheme is in
  * `graft.streams.nonAtomicRenameSchemes`, and
  * `graft.streams.requireAtomicCheckpoint=true` escalates the warning
  * to a submit-time refusal. */
class CheckpointContractSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix)
      .toFile.getAbsolutePath

  test("checkpoint scheme contract: non-atomic-rename schemes flag, atomic ones don't, strict mode refuses at the constructor") {
    spark.sparkContext.hadoopConfiguration.set("fs.cprn.impl",
      classOf[CopyRenameFileSystem].getName)
    // a local checkpoint (no scheme / file:) is the supported shape
    assert(!Streams.checkpointRenameContract(spark, tmp("ckp-ok")),
      "a local checkpoint dir must not flag")
    assert(!Streams.checkpointRenameContract(spark,
      "nost://" + tmp("ckp-nost")),
      "nost:// renames atomically — a checkpoint there is supported " +
        "(ObjectStoreStreamsSpec runs one end-to-end)")
    // the copy+delete-rename store flags (same list covers bare s3a)
    assert(Streams.checkpointRenameContract(spark,
      "cprn://" + tmp("ckp-cprn")),
      "a copy-rename checkpoint dir must flag")
    assert(Streams.checkpointRenameContract(spark, "s3a://bucket/ckp"),
      "bare S3A is in the default non-atomic list")
    // the list is a conf, not a constant — deployments with an
    // atomic-rename layer over s3a (e.g. a consistent metadata
    // layer) can clear it
    spark.conf.set("graft.streams.nonAtomicRenameSchemes", "cprn")
    try assert(!Streams.checkpointRenameContract(spark,
      "s3a://bucket/ckp"))
    finally spark.conf.unset("graft.streams.nonAtomicRenameSchemes")
    // strict mode: the CONSTRUCTOR refuses, before any query starts —
    // a deployment that would rather fail at submit than risk a
    // bricked restart at the next crash
    spark.conf.set("graft.streams.requireAtomicCheckpoint", "true")
    try {
      implicit val sqlCtx = spark.sqlContext
      val ids = MemoryStream[Long]
      val e = intercept[IllegalArgumentException] {
        Streams.takedownStream(ids.toDF(), "value",
          tmp("ckp-idx"), "cprn://" + tmp("ckp-strict"))
      }
      assert(e.getMessage.contains("not atomic"),
        s"strict mode must refuse with the contract (got ${e.getMessage})")
      // and the atomic-scheme path still constructs: the guard gates
      // only what the contract forbids
      val q = Streams.takedownStream(ids.toDF(), "value",
        tmp("ckp-idx2"), tmp("ckp-local"))
      q.stop()
    } finally spark.conf.unset("graft.streams.requireAtomicCheckpoint")
  }
}
