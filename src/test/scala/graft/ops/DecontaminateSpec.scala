package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Benchmark-decontamination semantics: gram overlap detection,
  * distinct-gram counting, the short-document collapse, and the
  * removal anti-join. */
class DecontaminateSpec extends SparkSpecBase {

  private val K = 5 // small gram width keeps fixtures readable

  private def grams(textCol: String) =
    Decontaminate.gramHashes(Dedup.tokens(col(textCol)), K).as("grams")

  test("a corpus doc sharing a k-token run with the benchmark is reported") {
    import spark.implicits._
    val bench = Seq(
      (100L, "what is the capital of france paris obviously")).toDF("doc_id", "text")
      .select($"doc_id", grams("text"))
    val corpus = Seq(
      // embeds the benchmark's 5-token run "what is the capital of"
      (1L, "trivia section what is the capital of france answered"),
      // no shared 5-gram
      (2L, "completely unrelated text about spark shuffles and joins"),
      // shares TWO distinct benchmark grams
      (3L, "what is the capital of france paris people ask")).toDF("doc_id", "text")
      .select($"doc_id", grams("text"))
    val report = Decontaminate.overlapReport(corpus, bench, "doc_id", "grams")
      .orderBy($"doc_id").collect()
    assert(report.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    val hit1 = report(0)
    // doc 1: 9 tokens → 5 grams, of which exactly 2 are benchmark grams
    // ("what is the capital of", "is the capital of france")
    assert(hit1.getAs[Long]("n_hit") == 2L)
    assert(hit1.getAs[Long]("n_grams") == 5L)
    assert(hit1.getAs[Double]("contamination") == 0.4)
    val hit3 = report(1)
    assert(hit3.getAs[Long]("n_hit") > hit1.getAs[Long]("n_hit"))
  }

  test("token-coverage: overlapping matches union, disjoint ones add, cap holds") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("cov")
      .toFile.getAbsolutePath
    Seq(
      (0L, "q r s t u"), // %7==0: the benchmark (3-grams qrs, rst, stu)
      (1L, "x q r s t y z"), // matches at pos 2,3 (overlap): 1+3 = 4 of 7
      (2L, "a b c d e f"), // clean: absent from the report
      (3L, "q r s a a a a r s t"), // disjoint matches: 3+3 = 6 of 10
      (5L, "r s t")) // whole doc is one benchmark gram: coverage 1.0
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = graft.queries.CurationQueries
      .contaminationCoverage(spark, d, k = 3).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(rows.keySet == Set(1L, 3L, 5L))
    assert(rows(1L) == ((7L, 2L, 4L,
      BigDecimal(4.0 / 7).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(rows(3L) == ((10L, 2L, 6L, 0.6)))
    assert(rows(5L) == ((3L, 1L, 3L, 1.0)))
  }

  test("repeated grams in a document count once (distinct semantics)") {
    import spark.implicits._
    val run = "a b c d e"
    val bench = Seq((9L, run)).toDF("doc_id", "text")
      .select($"doc_id", grams("text"))
    val corpus = Seq((1L, s"$run $run $run")).toDF("doc_id", "text")
      .select($"doc_id", grams("text"))
    val r = Decontaminate.overlapReport(corpus, bench, "doc_id", "grams")
      .collect()
    assert(r.length == 1)
    // "a b c d e" appears at three positions in the corpus doc, but
    // n_hit counts DISTINCT matching grams — once, not 3×
    assert(r(0).getAs[Long]("n_hit") == 1L)
  }

  test("documents shorter than k collapse to one whole-text gram") {
    import spark.implicits._
    val bench = Seq((9L, "tiny doc")).toDF("doc_id", "text")
      .select($"doc_id", grams("text"))
    val exact = Seq((1L, "tiny doc"), (2L, "tiny doc extended past"))
      .toDF("doc_id", "text").select($"doc_id", grams("text"))
    val r = Decontaminate.overlapReport(exact, bench, "doc_id", "grams")
      .collect()
    // only the exact short copy collides with the collapsed gram
    assert(r.map(_.getLong(0)).toSeq == Seq(1L))
    assert(r(0).getAs[Double]("contamination") == 1.0)
  }

  test("removeContaminated drops exactly the reported ids") {
    import spark.implicits._
    val bench = Seq((9L, "one two three four five")).toDF("doc_id", "text")
      .select($"doc_id", grams("text"))
    val corpus = Seq(
      (1L, "x one two three four five y"),
      (2L, "clean document with no overlap at all")).toDF("doc_id", "text")
      .select($"doc_id", grams("text"))
    val report = Decontaminate.overlapReport(corpus, bench, "doc_id", "grams")
    val left = Decontaminate.removeContaminated(corpus, report, "doc_id")
      .select($"doc_id").collect().map(_.getLong(0)).toSeq
    assert(left == Seq(2L))
  }

  test("q115 excision: span union removed, ends kept, whole-doc limit case, clean untouched") {
    import spark.implicits._
    def md5(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val d = java.nio.file.Files.createTempDirectory("excise")
      .toFile.getAbsolutePath
    Seq(
      (7L, "a b c"), // eval doc: benchmark gram "a b c"
      (14L, "b c d"), // eval doc: benchmark gram "b c d"
      (1L, "x y a b c z w"), // middle span excised, ends kept
      (2L, "p q r s"), // clean
      (3L, "a b c"), // short contaminated doc: whole-doc excision
      (5L, "a b c d e")) // OVERLAPPING matches at 1 and 2 → union [1,4]
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = graft.queries.CurationQueries
      .exciseContaminated(spark, d, k = 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 5L), "eval slice never reports")
    assert(out(1L) == ((7L, 3L, md5("x y z w"))))
    assert(out(2L) == ((4L, 0L, md5("p q r s"))), "clean doc untouched")
    assert(out(3L) == ((3L, 3L, md5(""))), "drop semantics as limit case")
    assert(out(5L) == ((5L, 4L, md5("e"))),
      "overlapping spans union before removal")
  }
}
