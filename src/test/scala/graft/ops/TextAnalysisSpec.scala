package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpecBase

class TextAnalysisSpec extends SparkSpecBase {

  private val docT = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def run(text: String, c: org.apache.spark.sql.Column): Row =
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, text)), 1), docT)
      .select(c.as("out")).head

  test("langId picks the language with most stopword hits") {
    def lid(t: String) =
      run(t, TextAnalysis.langId(TextAnalysis.tokensOf(col("text"))))
        .getString(0)
    assert(lid("the cat and the dog is in a house") == "en")
    assert(lid("der hund und die katze ist nicht da") == "de")
    assert(lid("le chat et les chiens dans la maison") == "fr")
    // tie at zero hits → first language code in order (de)
    assert(lid("zzz qqq www") == "de")
  }

  test("withLangId equals langId and evaluates each profile once") {
    // Parity corpus: clear winners, zero-hit ties, mixed-language docs
    // (greatest-tie at nonzero hits), empties.
    val texts = Seq(
      "the cat and the dog is in a house",
      "der hund und die katze ist nicht da",
      "el perro y los gatos no es un", "", "zzz qqq www",
      "the der le el 的", // every profile scores 1 → tie → de
      "la la la") // la is in es AND fr profiles → tie → es
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").repartition(2)
      .withColumn("toks", TextAnalysis.tokensOf(col("text")))
    val both = TextAnalysis.withLangId(df, col("toks"), "staged")
      .withColumn("single", TextAnalysis.langId(col("toks")))
    both.collect().foreach(r =>
      assert(r.getAs[String]("staged") == r.getAs[String]("single"), r))
    // The staged plan runs one stopword_hits per language per row —
    // the single-expression form inlines ~6× that (round-6 audit).
    val staged = TextAnalysis.withLangId(df, col("toks"), "predicted")
      .select("doc_id", "predicted")
    val sites = "stopword_hits\\(".r
      .findAllMatchIn(staged.queryExecution.optimizedPlan.toString).length
    assert(sites == TextAnalysis.stopwords.length,
      s"expected ${TextAnalysis.stopwords.length} kernel sites, got $sites")
    // withLangId leaves no staging residue
    assert(!staged.columns.exists(_.startsWith("__hits_")))
  }

  test("kgram hashes are positional (repeats kept) and winnowing dedups") {
    val toks = TextAnalysis.tokensOf(col("text"))
    val r = run("a b c d a b c d a b c d",
      struct(
        size(TextAnalysis.kgramHashes(toks)).as("nk"),
        size(TextAnalysis.winnowFingerprints(
          TextAnalysis.kgramHashes(toks))).as("nf")))
    val s = r.getStruct(0)
    assert(s.getInt(0) == 9) // 12 tokens → 9 positional 4-grams
    assert(s.getInt(1) >= 1 && s.getInt(1) < 9) // window minima dedup
  }

  test("bpe pretokenizer splits words, numbers, punct, whitespace") {
    val r = run("hello world 42!", struct(
      TextAnalysis.bpeTokens(col("text")).as("toks"),
      TextAnalysis.punctCount(col("text")).as("np")))
    val s = r.getStruct(0)
    assert(s.getAs[scala.collection.Seq[String]]("toks") ==
      Seq("hello", " world", " 42", "!"))
    assert(s.getInt(1) == 1)
  }
}
