package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Bigram-LM build/score semantics: MLE probabilities, the minCount
  * pruning bound (model rows must STOP tracking corpus growth once
  * pruning engages — the 100 TB argument), pruning-as-identity at
  * minCount=1, and the smoothed held-out scoring rule. */
class LangModelSpec extends SparkSpecBase {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def bg(d: DataFrame) = LangModel.bigrams(d, "doc_id", "text")

  test("MLE log-probs: p(b|a) from counts, fixed-point rounded") {
    // corpus: "a b a c" → bigrams (a b), (b a), (a c)
    // c(a ·) = 2, so p(b|a) = 1/2; c(b ·) = 1, p(a|b) = 1
    val lm = LangModel.train(bg(docs(1L -> "a b a c"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(lm.keySet == Set("a b", "b a", "a c"))
    assert(lm("a b") == math.round(math.log(0.5) * 16777216.0))
    assert(lm("b a") == 0L) // ln(1) = 0
    assert(lm("a c") == math.round(math.log(0.5) * 16777216.0))
  }

  test("minCount=1 pruning is the identity (q61 parity premise)") {
    val d = docs(1L -> "a b c a b", 2L -> "b c d e")
    assert(LangModel.train(bg(d), 1L).collect().toSet ==
      LangModel.counts(bg(d))
        .select(col("g"),
          round(log(col("c2").cast("double") / col("c1")) * 16777216.0)
            .cast("long").as("lnp_fp"))
        .collect().toSet)
  }

  test("survivors' probabilities are unchanged by pruning (no renorm)") {
    // "x y" appears twice, "x z" once: pruning "x z" at minCount=2
    // must keep p(y|x) = 2/3 (marginal over UNPRUNED counts).
    val d = docs(1L -> "x y", 2L -> "x y", 3L -> "x z")
    val lm = LangModel.train(bg(d), 2L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(lm.keySet == Set("x y"))
    assert(lm("x y") == math.round(math.log(2.0 / 3.0) * 16777216.0))
  }

  test("model rows stop tracking corpus growth once pruning engages") {
    // A fixed head of repeated bigrams plus a hapax tail that grows
    // with the corpus: every added doc contributes fresh once-only
    // bigrams (Heaps-law stand-in). Unpruned model rows must grow
    // with the corpus; minCount=2 rows must stay EXACTLY the head.
    val head = (1L to 4L).map(i => i -> "the quick brown fox")
    def tail(n: Long) =
      (100L until 100L + n).map(i => i -> s"unique$i hapax$i only$i")
    def corpus(n: Long) = docs((head ++ tail(n)): _*)
    val smallUnpruned = LangModel.train(bg(corpus(4)), 1L).count()
    val bigUnpruned = LangModel.train(bg(corpus(16)), 1L).count()
    assert(bigUnpruned > smallUnpruned) // growth without pruning
    val smallPruned = LangModel.train(bg(corpus(4)), 2L).count()
    val bigPruned = LangModel.train(bg(corpus(16)), 2L).count()
    assert(smallPruned == 3L) // the quick / quick brown / brown fox
    assert(bigPruned == smallPruned) // bounded: growth is all hapax
  }

  test("in-vocabulary scoring averages the fixed-point log-probs") {
    val d = docs(1L -> "a b a c")
    val b = bg(d)
    val out = LangModel.score(b, LangModel.train(b)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 3L) // n_bigrams
    // avg_nll = -(ln(1/2) + ln(1) + ln(1/2)) / 3, via fixed point
    val fpSum = 2L * math.round(math.log(0.5) * 16777216.0)
    val expected = BigDecimal(-(fpSum.toDouble / 16777216.0) / 3.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(2) == expected)
  }

  test("smoothed scoring: unseen bigrams get the Laplace rule + n_oov") {
    import spark.implicits._
    // train: "a b a b" → model {a b: c2=2, c1=2; b a: c2=1, c1=1}
    // vocab: {a, b} + 1 OOV type → V = 3
    val train = bg(docs(1L -> "a b a b"))
    val test = bg(docs(5L -> "a b z"))
    val vocab = docs(1L -> "a b a b")
      .select(explode(Dedup.tokens($"text")).as("t"))
      .agg((count_distinct($"t") + 1L).as("v"))
    val out = LangModel.scoreSmoothed(
      test, LangModel.trainCounts(train), vocab).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 2L) // bigrams: (a b), (b z)
    assert(r.getLong(2) == 1L) // (b z) is OOV
    // lnp(a b) = ln((2+1)/(2+3)); lnp(b z) = ln((0+1)/(1+3))
    val fpSum = math.round(math.log(3.0 / 5.0) * 16777216.0) +
      math.round(math.log(1.0 / 4.0) * 16777216.0)
    val expected = BigDecimal(-(fpSum.toDouble / 16777216.0) / 2.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) == expected)
  }

  test("smoothed scoring drops the null-gram row of sub-bigram docs") {
    import spark.implicits._
    val train = bg(docs(1L -> "a b"))
    val test = bg(docs(5L -> "solo", 10L -> "a b"))
    val vocab = docs(1L -> "a b")
      .select(explode(Dedup.tokens($"text")).as("t"))
      .agg((count_distinct($"t") + 1L).as("v"))
    val out = LangModel.scoreSmoothed(
      test, LangModel.trainCounts(train), vocab)
    // doc 5 has no bigram → no row (matches the oracle's
    // unnest-of-empty), not a phantom single-OOV row
    assert(out.select($"doc_id").collect().map(_.getLong(0)).toSeq ==
      Seq(10L))
  }
}
