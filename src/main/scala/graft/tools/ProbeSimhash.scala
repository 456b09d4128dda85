package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Measures the q44 → q50 scale claim on a synthetic corpus: exact
  * banded-LSH candidate volume (Σ C(bucket_df, 2) per band — what the
  * collision join materializes) for the 32-bit/8-bit-slice form vs
  * the 64-bit/16-bit-slice form, plus the df-capped variant. Usage:
  * `runMain graft.tools.ProbeSimhash [N] [dfCap]` (default 50000,
  * 1000). Corpus: ~30-token docs from a deterministic vocabulary;
  * 2% are one-token mutations of their predecessor (true near-dups).
  * Prints one JSON line per variant. */
object ProbeSimhash {

  private def candidateStats(banded: DataFrame): (Long, Long, Long) = {
    val row = banded.groupBy("band", "band_val")
      .agg(count(lit(1)).as("df"))
      .agg(sum((col("df") * (col("df") - 1) / 2).cast("long")).as("cands"),
        max(col("df")).as("maxdf"),
        count(lit(1)).as("buckets"))
      .head()
    (row.getLong(0), row.getLong(1), row.getLong(2))
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val dfCap = args.lift(1).map(_.toInt).getOrElse(1000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // Deterministic token soup: token t of doc i picks a vocab word
    // via Spark's seeded xxhash64 (stable across runs). Most docs are
    // mutually distinct; every 50th doc (2%) reuses its PREDECESSOR's
    // base tokens with one changed token — the planted near-dup
    // population. (The first version of this generator keyed tokens
    // on the 50-block id, which made every block a 50-doc dup clique
    // — a far more duplicate-saturated corpus than described; caught
    // in the round-6 review, numbers re-measured.)
    val vocabSize = 5000
    val baseId = when($"id" % 50 === 0 && $"id" > 0, $"id" - 1)
      .otherwise($"id")
    val docs = spark.range(n.toLong).select(
      $"id".as("doc_id"),
      concat_ws(" ", (0 until 30).map(t =>
        concat(lit("w"), pmod(xxhash64(baseId, lit(t)), lit(vocabSize)))) :+
        when($"id" % 50 === 0, lit("mutated")).otherwise(lit("tail")): _*)
        .as("text"))
      .repartition(32)

    val toks = Dedup.tokens($"text")
    for ((bits, sh) <- Seq(32 -> Dedup.simhash32(toks),
        64 -> Dedup.simhash64(toks))) {
      val fp = docs.select($"doc_id", sh.as("simhash"))
      val banded = Dedup.simhashBands(fp, "doc_id", "simhash", bits, 4)
      val t0 = System.nanoTime()
      val (cands, maxdf, buckets) = candidateStats(banded)
      val secs = (System.nanoTime() - t0) / 1e9
      println(s"""{"variant":"simhash$bits","n":$n,"candidates":$cands,""" +
        s""""max_bucket_df":$maxdf,"buckets":$buckets,""" +
        s""""stats_sec":${math.rint(secs * 100) / 100}}""")
      // End-to-end pair-join wall-clock (candidates → distinct →
      // Hamming verify), the cost the candidate volume predicts.
      val joinFn: DataFrame => DataFrame =
        if (bits == 32) Dedup.simhashNearDupPairs(_, "doc_id", "simhash",
          maxHamming = 3, bands = 4)
        else Dedup.simhashNearDupPairs64(_, "doc_id", "simhash")
      val tj = System.nanoTime()
      val pairs = joinFn(fp).count()
      val joinSecs = (System.nanoTime() - tj) / 1e9
      println(s"""{"variant":"simhash${bits}_join","n":$n,""" +
        s""""pairs":$pairs,"join_sec":${math.rint(joinSecs * 100) / 100}}""")
      if (bits == 64) {
        val capped = banded.groupBy("band", "band_val")
          .agg(count(lit(1)).as("df"))
          .filter(col("df") <= dfCap)
          .agg(coalesce(sum((col("df") * (col("df") - 1) / 2).cast("long")),
            lit(0L)),
            coalesce(max(col("df")), lit(0L)), count(lit(1))).head()
        println(s"""{"variant":"simhash64_dfcap$dfCap","n":$n,""" +
          s""""candidates":${capped.getLong(0)},""" +
          s""""max_bucket_df":${capped.getLong(1)},""" +
          s""""buckets":${capped.getLong(2)}}""")
      }
    }
    spark.stop()
  }
}
