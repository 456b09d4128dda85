package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** q106 contract: the delta-only index refresh — coverage, code
  * validity, and the per-row independence that makes the refresh
  * append-only (splitting a batch changes nothing, and a batch's
  * arrival never changes previously-encoded rows). */
class IncrementalAnnSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val e = graft.io.Tables.embeddings(spark, dir)
    .select($"vec_id", $"embedding")
  private lazy val maxId = e.agg(max($"vec_id")).head().getLong(0)
  private lazy val w = maxId * 4 / 5
  private lazy val old = e.filter($"vec_id" <= w)
  private lazy val fresh = e.filter($"vec_id" > w)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    graft.ops.Checkpoints.consume(df)(_.collect())
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap

  test("delta output covers exactly the batch, with valid cells and codes") {
    val out = rows(SimilarityQueries.incrementalAnnIndex(spark, dir))
    assert(out.keySet == (w + 1 to maxId).toSet,
      "one index row per delta vector, none for the existing corpus")
    out.values.foreach { case (cell, codes) =>
      assert(cell >= 0 && cell < 16)
      val cs = codes.split(",").map(_.toInt)
      assert(cs.length == 8 && cs.forall(x => x >= 0 && x < 16))
    }
  }

  test("splitting the batch changes nothing: per-row independence = append-only refresh") {
    val whole = rows(
      SimilarityQueries.incrementalAnnIndexFrames(old, fresh))
    val mid = (w + maxId) / 2
    val partA = rows(SimilarityQueries.incrementalAnnIndexFrames(
      old, fresh.filter($"vec_id" <= mid)))
    val partB = rows(SimilarityQueries.incrementalAnnIndexFrames(
      old, fresh.filter($"vec_id" > mid)))
    assert(partA.nonEmpty && partB.nonEmpty)
    assert(partA ++ partB == whole,
      "batch-wise refresh must equal the one-shot delta")
  }

  test("a batch's arrival never changes previously-encoded rows (fixed artifacts)") {
    // encode the OLD corpus against its own artifacts, then "arrive"
    // the batch and encode the old rows again — identical rows,
    // because the artifacts are functions of the old corpus alone
    val before = rows(
      SimilarityQueries.incrementalAnnIndexFrames(old, old))
    val after = rows(SimilarityQueries.incrementalAnnIndexFrames(
      old, old.unionByName(fresh)))
      .filter { case (id, _) => id <= w }
    assert(before == after,
      "existing codes must be stable under batch arrival")
  }
}
