package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** q143's PLANS claim is "thousands of saved searches — still
  * broadcast-scale". This drives the percolator at 512 stored
  * queries (85× the gated default) to prove the width holds: the
  * stored-query side stays a broadcast join (need now rides ON the
  * broadcast frame — a typedLit need-map would grow the plan text
  * itself with |queries|), and per-query outputs stay correct under
  * an independent recount. */
class PercolateScaleSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("percolate holds at 512 stored queries: broadcast plan, correct counts") {
    val out = TextQueries.percolate(spark, dir, nQueries = 512)
    // plan shape: the stored-query table joins as a BROADCAST, and
    // no literal map expression scales with the query count
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "stored queries must broadcast")
    assert(!plan.contains("map_from_arrays") && !plan.contains("map("),
      "need must ride the broadcast frame, not a literal map")
    val rows = out.collect()
    assert(rows.nonEmpty && rows.length <= 512)
    // queries emit only when they match ≥1 doc; every emitted count
    // must survive an independent per-query recount
    val docs = graft.io.Tables.documents(spark, dir)
      .select($"doc_id", graft.ops.FullText.analyze($"text").as("toks"))
      .localCheckpoint()
    val sample = rows.sortBy(_.getLong(0)).take(3) ++ rows.takeRight(2)
    sample.foreach { r =>
      val terms = r.getString(1).split(" ").distinct.toSeq
      val n = docs.filter(terms.map(t =>
        array_contains($"toks", t): org.apache.spark.sql.Column)
        .reduce(_ && _)).count()
      assert(n == r.getLong(2),
        s"query '${r.getString(1)}' count ${r.getLong(2)} != recount $n")
    }
    graft.ops.Checkpoints.unpersist(docs)
    // the STORED face holds at the same width, frame-equal
    val idx = java.nio.file.Files.createTempDirectory("perc-512")
      .toFile.getAbsolutePath
    graft.ops.FullText.writeTextIndex(
      graft.io.Tables.documents(spark, dir), "doc_id", "text", idx)
    val queries = rows.map(r =>
      (r.getLong(0), r.getString(1).split(" ").toSeq)).toSeq
    val stored = graft.ops.FullText.percolateStored(spark, idx, queries)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSeq
    val self = rows.map(r =>
      (r.getLong(0), r.getLong(2), r.getString(3))).toSeq
    assert(stored.sortBy(_._1) == self.sortBy(_._1),
      "stored percolation must match at 512 queries")
  }
}
