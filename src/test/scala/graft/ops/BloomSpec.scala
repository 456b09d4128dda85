package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.expressions.TextHashes
import graft.queries.CurationQueries

/** Bloom-filter decontamination (q95): the driver-side build, the
  * compiled probe kernel, and the query-level no-false-negative /
  * FP-accounting contracts.
  */
class BloomSpec extends SparkSpecBase {
  private val dir = "/root/testdata/sf0.001"

  test("driver build and kernel probe agree: no false negatives, bounded FPs") {
    import spark.implicits._
    val members = (0 until 500).map(i => s"gram-$i")
    val bits = BloomFilter.build(members)
    // every inserted gram hits (a Bloom filter cannot miss)
    val hitAll = Seq(Tuple1(members)).toDF("grams")
      .select(TextHashes.bloomHitCount($"grams", bits,
        BloomFilter.defaultProbes))
      .head().getLong(0)
    assert(hitAll == members.length.toLong)
    // non-members rarely hit: at ~2% fill the per-gram FP rate is
    // ~1e-5; 10k non-members should see at most a handful
    val nonMembers = (0 until 10000).map(i => s"other-$i")
    val fp = Seq(Tuple1(nonMembers)).toDF("grams")
      .select(TextHashes.bloomHitCount($"grams", bits,
        BloomFilter.defaultProbes))
      .head().getLong(0)
    val fill = BloomFilter.fillRatio(bits)
    assert(fill > 0.0 && fill < 0.05, s"unexpected fill $fill")
    assert(fp <= 20L, s"FP count $fp implausibly high at fill $fill")
  }

  test("driver position math matches the kernel bit that was set") {
    // a single-gram filter: exactly the gram's kProbes positions are
    // set, and the kernel finds the gram (bit-identical position math
    // between BloomFilter.position and HashKernels.bloomPosition)
    import spark.implicits._
    val bits = BloomFilter.build(Seq("solo"), 64 * 4, 3)
    val setBits = bits.map(java.lang.Long.bitCount(_)).sum
    assert(setBits >= 1 && setBits <= 3) // probes may collide
    val hit = Seq(Tuple1(Seq("solo"))).toDF("grams")
      .select(TextHashes.bloomHitCount($"grams", bits, 3))
      .head().getLong(0)
    assert(hit == 1L)
  }

  test("null grams and empty arrays never hit") {
    import spark.implicits._
    val bits = BloomFilter.build(Seq("x"))
    val df = Seq(
      (1L, Seq[String]()),
      (2L, Seq("x", "x"))).toDF("doc_id", "grams")
    val out = df.select($"doc_id",
      TextHashes.bloomHitCount($"grams", bits, 3).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 0L)
    assert(out(2L) == 2L) // repeated member counts per element
  }

  test("q95: exact contamination is a subset of bloom flags, FPs accounted") {
    val bloom = CurationQueries.bloomDecontaminate(spark, dir).collect()
    val exactIds = CurationQueries.decontaminate(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bloomIds = bloom.map(_.getLong(0)).toSet
    assert(exactIds.subsetOf(bloomIds),
      "a Bloom filter cannot produce false negatives")
    bloom.foreach { r =>
      assert(r.getLong(2) >= r.getLong(3),
        "bloom hits >= exact hits per doc")
      assert(r.getLong(4) == r.getLong(2) - r.getLong(3))
      assert(r.getLong(2) <= r.getLong(1), "hits bounded by gram count")
    }
  }
}
