package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.ops.FullText

/** A conditional-put publication fake for [[CommitMarker]]: re-read
  * the mutation lease at publication time and REFUSE when the fence
  * token no longer matches the one this writer committed under — the
  * check-and-create a real deployment would push into its store's
  * CAS primitive (S3 conditional put, an etcd/DynamoDB row). Loaded
  * reflectively via `graft.index.commitMarkerFactory`, so it must be
  * a top-level no-arg class. */
class ReadCheckCasMarker extends CommitMarker {
  override def publish(fs: FileSystem, marker: Path, indexDir: String,
      expectedToken: Option[String]): Boolean = {
    val ok = expectedToken match {
      case None => true // legacy unleased caller: nothing to condition on
      case Some(tok) =>
        val lock = new Path(s"$indexDir/_mutation.lock")
        fs.exists(lock) && {
          val in = fs.open(lock)
          val content =
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          content.split(' ').lift(1).contains(tok)
        }
    }
    if (ok) fs.create(marker, true).close()
    ok
  }
}

/** The injectable-CAS contract (Layout's commit protocol, closing the
  * bare-S3A residual window): with a conditional-put publisher
  * configured, a fence token that moves between the second fence
  * re-read and the marker create makes publication REFUSE — the
  * fully-renamed generation stays unpublished and invisible, the
  * previous generation serves unchanged, and the replayed mutation
  * lands cleanly. Run under `cprn://` (copy+delete renames, the very
  * store class the hook exists for). */
class CasMarkerSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val terms = Seq("fast", "vector", "query")

  test("a CAS marker refuses publication when the fence token moves mid-commit; the plain path would have published") {
    spark.sparkContext.hadoopConfiguration.set("fs.cprn.impl",
      classOf[CopyRenameFileSystem].getName)
    val docs = graft.io.Tables.documents(spark, dir).limit(60)
    val idx = "cprn://" + java.nio.file.Files
      .createTempDirectory("cas-idx").toFile.getAbsolutePath
    val fs = new Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    FullText.writeTextIndex(docs, "doc_id", "text", idx,
      storeTermVectors = true)
    val allIds = docs.select($"doc_id").collect().map(_.getLong(0)).sorted
    spark.conf.set("graft.index.commitMarkerFactory",
      classOf[ReadCheckCasMarker].getName)
    try {
      // happy path: the token is unmoved at publication, the CAS
      // passes, and the commit is indistinguishable from the default
      FullText.deleteFromTextIndex(spark, idx, Seq(allIds.head))
      assert(Layout.liveGeneration(spark, idx).contains(1L),
        "an unchallenged CAS commit must publish normally")
      def page() = FullText.bm25SearchStored(spark, idx, terms)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val before = page()
      // the residual instant: this writer passed the second fence
      // re-read, then a takeover lands before the marker create. The
      // plain publisher would publish anyway (LeaseSpec pins that as
      // benign-at-worst); the CAS publisher must REFUSE.
      Layout.beforeMarkerHook = () => {
        Layout.beforeMarkerHook = () => ()
        val out = fs.create(new Path(s"$idx/_mutation.lock"), true)
        out.write("9 intruder-token otherhost:pid=7".getBytes("UTF-8"))
        out.close()
      }
      val e = intercept[IllegalStateException] {
        try FullText.deleteFromTextIndex(spark, idx, Seq(allIds(1)))
        finally Layout.beforeMarkerHook = () => ()
      }
      assert(e.getMessage.contains("REFUSED"),
        s"the refusal must surface as the commit abort (got $e)")
      // the renamed-but-unpublished generation is invisible: live
      // generation and page unchanged, no marker under gen-2
      assert(Layout.liveGeneration(spark, idx).contains(1L),
        "a refused publication must not advance the live generation")
      assert(page() == before,
        "the served page must still be the previous generation's")
      assert(!Layout.pathExists(spark, s"$idx/gen-2/_COMMITTED"),
        "the refused generation must carry no marker")
      // the intruder's lock blocks a replay (correct — it holds the
      // lease now); clear it as its crash/release would, then the
      // REPLAYED mutation must land cleanly over the refused leftover
      fs.delete(new Path(s"$idx/_mutation.lock"), false)
      FullText.deleteFromTextIndex(spark, idx, Seq(allIds(1)))
      assert(Layout.liveGeneration(spark, idx).contains(2L),
        "the replayed mutation must publish the generation the " +
          "refusal kept invisible")
      assert(page() != before,
        "the replayed delete must now be servable")
    } finally {
      spark.conf.unset("graft.index.commitMarkerFactory")
      Layout.beforeMarkerHook = () => ()
    }
  }
}
