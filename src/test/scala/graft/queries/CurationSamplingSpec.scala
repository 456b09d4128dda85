package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Round-8 late additions: CCNet perplexity buckets (q91),
  * edit-distance verified near-dup (q92), Efraimidis–Spirakis
  * weighted sampling (q93), and the cross-source n-gram containment
  * matrix (q94). sf0.001 tests pin the query-level invariants the
  * oracles rely on; fixture tests pin the operator math where a
  * constructed input makes the property sharper.
  */
class CurationSamplingSpec extends SparkSpecBase {
  private val dir = "/root/testdata/sf0.001"

  test("q91 buckets partition each source and order by perplexity") {
    val out = CurationQueries.perplexityBuckets(spark, dir).collect()
    val bySource = out.groupBy(_.getString(0))
    bySource.foreach { case (src, rows) =>
      val buckets = rows.map(_.getString(1)).toSet
      assert(buckets == Set("head", "middle", "tail"),
        s"$src missing a tercile: $buckets")
      val m = rows.map(r => r.getString(1) -> r).toMap
      // head scores strictly below tail (mean NLL is the bucket key)
      assert(m("head").getDouble(3) <= m("middle").getDouble(3))
      assert(m("middle").getDouble(3) <= m("tail").getDouble(3))
      // bin-granularity terciles: no bucket is empty, and the ranges
      // are disjoint (max of head <= min of middle, etc. at 2dp bins)
      assert(rows.forall(_.getLong(2) > 0L))
      assert(m("head").getDouble(5) <= m("middle").getDouble(4) + 0.01)
      assert(m("middle").getDouble(5) <= m("tail").getDouble(4) + 0.01)
    }
    // every scored document lands in exactly one bucket
    val total = out.map(_.getLong(2)).sum
    val scored = graft.ops.LangModel.score(
      graft.ops.LangModel.bigrams(
        graft.io.Tables.documents(spark, dir), "doc_id", "text"),
      graft.ops.LangModel.train(
        graft.ops.LangModel.bigrams(
          graft.io.Tables.documents(spark, dir), "doc_id", "text")))
      .count()
    assert(total == scored)
  }

  test("q92 verdict discriminates and lev agrees with identical text") {
    val out = DedupQueries.editDistanceDedup(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val lev = r.getLong(3)
      val ratio = r.getDouble(4)
      assert(ratio <= 1.0 && ratio > 0.0)
      if (lev == 0L) assert(ratio == 1.0)
      assert(r.getLong(5) == (if (ratio >= DedupQueries.editDistanceThreshold) 1L else 0L))
    }
    // the 0.98 threshold actually separates the candidate set
    val verdicts = out.map(_.getLong(5)).toSet
    assert(verdicts == Set(0L, 1L),
      s"threshold should split candidates, got $verdicts")
  }

  test("q92 jaccard-vs-levenshtein disagreement is visible on typo clones") {
    import spark.implicits._
    // a typo clone: one character changed per token — shingle Jaccard
    // collapses (every shingle is touched) while the character-level
    // similarity stays near 1. This is exactly the pair class a
    // Jaccard-threshold dedup mislabels and q92's second score
    // catches — and also why banded LSH may MISS it entirely (its
    // signature shares no shingles), which the operator documents as
    // the candidate-generation recall limit.
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = a.replace('o', '0')
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val sh = docs.select($"doc_id",
      graft.ops.Dedup.shingles(graft.ops.Dedup.tokens($"text"), 3)
        .as("shingles"))
    val j = sh.as("x").join(sh.as("y"),
        $"x.doc_id" < $"y.doc_id")
      .select(graft.ops.Dedup.jaccard($"x.shingles", $"y.shingles"))
      .head().getDouble(0)
    val levRatio = docs.filter($"doc_id" === 1L)
      .crossJoin(docs.filter($"doc_id" === 2L).toDF("id2", "text2"))
      .select(lit(1.0) - levenshtein($"text", $"text2").cast("double") /
        greatest(length($"text"), length($"text2")))
      .head().getDouble(0)
    assert(j < 0.2, s"shingle Jaccard collapses on typo clones, got $j")
    assert(levRatio > 0.9,
      s"character similarity stays high, got $levRatio")
  }

  test("q93 returns exactly k rows, covers weights, and is deterministic") {
    val out1 = PipelineQueries.weightedSample(spark, dir).collect()
    val out2 = PipelineQueries.weightedSample(spark, dir).collect()
    assert(out1.length == 100)
    assert(out1.map(_.getLong(0)).toSeq == out2.map(_.getLong(0)).toSeq,
      "rerun must select the identical sample")
    val ws = out1.map(_.getLong(2)).toSet
    assert(ws.subsetOf(Set(1L, 2L, 3L, 4L)) && ws.size >= 2)
    // weighted inclusion: mean weight of the sample exceeds the corpus
    // mean (heavier docs win more often, the E-S property)
    val corpusMeanW = graft.io.Tables.documents(spark, dir)
      .select(((regexp_extract(col("source"), "(\\d+)$", 1)
        .cast("long") % 4L) + 1L).as("w"))
      .agg(avg(col("w"))).head().getDouble(0)
    val sampleMeanW = out1.map(_.getLong(2)).sum.toDouble / out1.length
    assert(sampleMeanW > corpusMeanW,
      s"sample mean weight $sampleMeanW should exceed corpus $corpusMeanW")
  }

  test("q94 containment bounds and full matrix shape") {
    val out = TextQueries.crossSourceOverlap(spark, dir).collect()
    val sources = out.map(_.getString(0)).toSet ++ out.map(_.getString(1)).toSet
    assert(out.length == sources.size * (sources.size - 1),
      "every ordered source pair appears")
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3), "n_common <= n_grams_a")
      val c = r.getDouble(4)
      assert(c > 0.0 && c <= 1.0)
    }
  }

  test("q97 snapshot diff: statuses complete, deltas match construction") {
    val out = PipelineQueries.snapshotDiff(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("added", "removed", "changed", "unchanged"))
    val docs = graft.io.Tables.documents(spark, dir)
    val n = docs.count()
    val added = docs.filter(org.apache.spark.sql.functions
      .col("doc_id") % 10 === 7).count()
    val removed = docs.filter(org.apache.spark.sql.functions
      .col("doc_id") % 13 === 3).count()
    assert(out("added").getLong(1) == added)
    assert(out("removed").getLong(1) == removed)
    // every new-side doc is added/changed/unchanged; old extras are removed
    assert(out("added").getLong(1) + out("changed").getLong(1) +
      out("unchanged").getLong(1) == n)
    // added docs have no old side; removed no new side
    assert(out("added").getLong(2) == 0L)
    assert(out("removed").getLong(3) == 0L)
    // upper-casing changes the hash but never the token count
    assert(out("changed").getLong(4) == 0L, "changed token_delta is 0")
    assert(out("unchanged").getLong(4) == 0L)
  }

  test("q94 containment is asymmetric on a subset fixture") {
    import spark.implicits._
    // source B's grams are a strict subset of A's
    val docs = Seq(
      (1L, "a b c d e f g h", "srcA"),
      (2L, "a b c d", "srcB")).toDF("doc_id", "text", "source")
    val g = docs.select($"source", explode(array_distinct(
      graft.expressions.TextHashes.kgramMd5(
        graft.ops.Dedup.tokens($"text"), 2))).as("g")).distinct()
    val tot = g.groupBy($"source").agg(count(lit(1)).as("n_grams_a"))
    val m = g.toDF("src_a", "g").join(g.toDF("src_b", "g"), Seq("g"))
      .filter($"src_a" =!= $"src_b")
      .groupBy($"src_a", $"src_b").agg(count(lit(1)).as("n_common"))
      .join(tot.withColumnRenamed("source", "src_a"), Seq("src_a"))
      .withColumn("containment",
        $"n_common".cast("double") / $"n_grams_a")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getDouble(4)).toMap
    assert(m(("srcB", "srcA")) == 1.0, "B fully contained in A")
    assert(m(("srcA", "srcB")) < 1.0, "A not contained in B")
  }

  test("q111 chunking: stride offsets, tail clamp, full coverage, no dropped docs") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("chunks")
      .toFile.getAbsolutePath
    val words100 = (1 to 100).map(i => s"w$i").mkString(" ")
    val words30 = (1 to 30).map(i => s"v$i").mkString(" ")
    Seq((1L, words100), (2L, words30), (3L, ""))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = graft.queries.PipelineQueries
      .chunkDocuments(spark, d, window = 50, stride = 40).collect()
    val byDoc = out.groupBy(_.getLong(0))
    // 100 tokens → starts 0,40,80 with lens 50,50,20
    assert(byDoc(1L).map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq == Seq((0L, 0L, 50L), (1L, 40L, 50L), (2L, 80L, 20L)))
    // 30 tokens → one whole-doc chunk
    assert(byDoc(2L).map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, 30L)))
    // empty doc → ONE empty chunk, never zero rows
    assert(byDoc(3L).map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, 0L)))
    // overlap arithmetic: consecutive windows cover [0, n) with
    // window−stride overlap — the union of spans is gapless
    val spans = byDoc(1L).map(r => (r.getLong(2), r.getLong(2) + r.getLong(3)))
    spans.sliding(2).foreach { case Array((_, e1), (s2, _)) =>
      assert(s2 < e1, "consecutive chunks overlap")
    }
    assert(spans.last._2 == 100L, "coverage reaches the last token")
    // digest is the md5 of the exact token slice
    val r1 = byDoc(1L).find(_.getLong(1) == 2L).get
    val expectTxt = (81 to 100).map(i => s"w$i").mkString(" ")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expectTxt.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r1.getString(4) == md)
  }
}
