package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpecBase

/** Mirrors reference J5 merge semantics (collectors.py:596-609): the
  * fetched version of a key wins; cached-only records survive; the
  * watermark is max(ts) - lookback. */
class IncrementalMergeSpec extends SparkSpecBase {

  private val t = StructType(Seq(
    StructField("number", IntegerType),
    StructField("state", StringType),
    StructField("updated_at", StringType)))

  private def df(rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), t)

  test("fetched wins per key, cached residue survives") {
    val cached = df(
      Row(1, "open", "2020-01-01T00:00:00Z"),
      Row(2, "open", "2020-01-02T00:00:00Z"))
    val fetched = df(
      Row(2, "closed", "2020-02-01T00:00:00Z"),
      Row(3, "open", "2020-02-02T00:00:00Z"))
    val out = IncrementalMerge.mergeLatest(cached, fetched, Seq("number"))
      .collect().map(r => r.getInt(0) ->
        (r.getAs[String]("state"), r.getAs[Int]("from_fetched"))).toMap
    assert(out == Map(
      1 -> ("open", 0), 2 -> ("closed", 1), 3 -> ("open", 1)))
  }

  test("enrichNew computes detail only for not-yet-enriched keys (J6)") {
    val recT = StructType(Seq(
      StructField("sha", StringType),
      StructField("files_changed_count", IntegerType)))
    def rdf(rows: Row*) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), recT)
    // merged history: s1/s2 cached (already enriched), s3 new
    val merged = rdf(Row("s1", 4), Row("s2", 2), Row("s3", null))
    val enrichedKeys = rdf(Row("s1", 4), Row("s2", 2))
    var enrichedRows: Set[String] = Set.empty
    val out = IncrementalMerge.enrichNew(merged, enrichedKeys,
      Seq("sha")) { fresh =>
      // the expensive detail pass must only ever see the new keys
      enrichedRows = fresh.collect().map(_.getString(0)).toSet
      fresh.withColumn("files_changed_count",
        org.apache.spark.sql.functions.lit(9))
    }.collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(enrichedRows == Set("s3"))
    assert(out == Map("s1" -> 4, "s2" -> 2, "s3" -> 9))
  }

  test("watermark = max ts minus lookback; None on empty cache") {
    val cached = df(
      Row(1, "open", "2020-01-01T00:00:00Z"),
      Row(2, "open", "2020-01-02T00:00:10Z"))
    val wm = IncrementalMerge.watermark(cached, Seq("updated_at"), 300)
    assert(wm.get.toInstant.toString == "2020-01-01T23:55:10Z")
    assert(IncrementalMerge.watermark(df(), Seq("updated_at")).isEmpty)
  }

  test("partitioned merge rewrites ONLY the touched partitions") {
    import spark.implicits._
    val cacheDir = java.nio.file.Files
      .createTempDirectory("graft-merge-part").toString
    Seq(
      ("r1", 1L, "a-v1"), ("r1", 2L, "b-v1"),
      ("r2", 1L, "c-v1"),
      ("r3", 1L, "d-v1"))
      .toDF("repo_name", "number", "title")
      .write.mode("overwrite").partitionBy("repo_name").parquet(cacheDir)

    def partFiles(p: String): Map[String, Long] = {
      val d = new java.io.File(s"$cacheDir/repo_name=$p")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val r1Before = partFiles("r1")
    val r3Before = partFiles("r3")

    // delta: updates r2's key 1, adds r2 key 2 — r1/r3 untouched
    val delta = Seq(("r2", 1L, "c-v2"), ("r2", 2L, "e-v1"))
      .toDF("repo_name", "number", "title")
    val touched = IncrementalMerge.mergeLatestPartitioned(
      cacheDir, delta, Seq("repo_name", "number"), "repo_name")
    assert(touched == 1)

    // untouched partitions: identical files, not rewritten
    assert(partFiles("r1") == r1Before)
    assert(partFiles("r3") == r3Before)

    // merged content: fetched wins, residue survives, corpus intact
    val after = spark.read.parquet(cacheDir)
      .collect().map(r => (r.getAs[String]("repo_name"),
        r.getAs[Long]("number")) -> r.getAs[String]("title")).toMap
    assert(after == Map(
      ("r1", 1L) -> "a-v1", ("r1", 2L) -> "b-v1",
      ("r2", 1L) -> "c-v2", ("r2", 2L) -> "e-v1",
      ("r3", 1L) -> "d-v1"))

  }

  test("partitioned merge keeps cached rows in a null-valued partition") {
    import spark.implicits._
    val cacheDir = java.nio.file.Files
      .createTempDirectory("graft-merge-nullpart").toString
    // degraded records with a null partition key land in parquet's
    // default partition; a delta touching it must MERGE, not replace
    Seq((null.asInstanceOf[String], 1L, "n1-v1"),
      (null.asInstanceOf[String], 2L, "n2-v1"),
      ("r1", 1L, "a-v1"))
      .toDF("repo_name", "number", "title")
      .write.mode("overwrite").partitionBy("repo_name").parquet(cacheDir)

    val delta = Seq((null.asInstanceOf[String], 1L, "n1-v2"))
      .toDF("repo_name", "number", "title")
    val touched = IncrementalMerge.mergeLatestPartitioned(
      cacheDir, delta, Seq("repo_name", "number"), "repo_name")
    assert(touched == 1)

    val after = spark.read.parquet(cacheDir)
      .collect().map(r => (Option(r.getAs[String]("repo_name")),
        r.getAs[Long]("number")) -> r.getAs[String]("title")).toMap
    // n2-v1 survived the rewrite of the null partition; n1 updated
    assert(after == Map(
      (None, 1L) -> "n1-v2", (None, 2L) -> "n2-v1",
      (Some("r1"), 1L) -> "a-v1"), after)
  }
}
