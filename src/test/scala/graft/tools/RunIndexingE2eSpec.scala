package graft.tools

import java.nio.file.Files

import graft.SparkSpecBase

/** The CLI composition end-to-end in dry-run mode: resolved settings →
  * live-transport construction → scanAndIndex over a real lake, no
  * store contact (the reference's --dry-run contract,
  * indexer.py:160-162). */
class RunIndexingE2eSpec extends SparkSpecBase {

  test("dry run parses the lake through the CLI path without writes") {
    val root = Files.createTempDirectory("graft-cli-lake").toFile
    val repo = new java.io.File(root, "o_r")
    repo.mkdirs()
    val w = new java.io.PrintWriter(
      new java.io.File(repo, "issues.json"), "UTF-8")
    try w.println(
      """[{"number": 1, "title": "t1", "user": {"login": "u"}},
        | {"number": 2, "title": "t2", "user": {"login": "u"}}]"""
        .stripMargin)
    finally w.close()

    val settings = RunIndexing
      .parseArgs(Seq("--data-dir", root.getAbsolutePath, "--dry-run",
        "--es-url", "http://localhost:1", "--api-key", "k"),
        RunIndexing.defaults(LocalSecrets.load(Some("/none"))))
    val res = RunIndexing.run(spark, settings)
    assert(res("issues") == graft.io.BulkSink.BulkResult(2, 0))
    assert(!res.contains("commits")) // absent artifact skipped
  }
}
