package graft.ops

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

/** Driver-side Bloom filter over a gram set — the bounded-size probe
  * artifact of Bloom-filter decontamination (q95).
  *
  * The 100 TB argument this operator exists for: q57's exact
  * decontamination broadcasts the benchmark's DISTINCT GRAM SET,
  * which grows linearly with the benchmark suite (fine for one eval
  * set, not for "every benchmark we have ever shipped" plus their
  * paraphrase expansions). The Bloom filter caps the broadcast at a
  * FIXED m bits chosen for a target false-positive rate — probes are
  * per-row compiled work (HashKernels.bloomHitCount rides the scan,
  * no explode, no join), false negatives are IMPOSSIBLE (a Bloom
  * filter never misses an inserted element, so no contaminated
  * document escapes), and false positives only send a few extra
  * clean documents to the exact verify/removal stage. The deploy
  * shape is probe-then-verify: Bloom pass over the full corpus,
  * exact gram join only for the tiny flagged slice — the same
  * generate-cheap/verify-exact split as LSH→Jaccard (q21) and
  * LSH→Levenshtein (q92).
  *
  * Position math is the house md5-prefix construction
  * (HashKernels.bloomPosition's scaladoc): uint32 of the first 8 md5
  * hex chars of "gram#i", mod m — reproducible in any engine with
  * md5, which is what lets the DuckDB oracle re-derive Bloom
  * semantics exactly (membership in the position SET is equivalent to
  * a bitset probe: a bit is set iff some benchmark gram set it).
  */
object BloomFilter {

  /** 64 Kbit default — 8 KiB of filter. At k=3 probes the
    * false-positive rate is (fill)³; sized so the test benchmarks
    * (thousands of grams) run at a few-percent fill with measurable
    * but small FP engagement. A deployment sizes m for its benchmark
    * suite: m ≈ −n·ln(p)/ln(2)² bits for n grams at FP rate p. */
  val defaultBits: Int = 65536

  /** 3 probes — near-optimal k for the default sizing (k = m/n·ln 2),
    * and few enough that the per-gram probe cost stays three md5s. */
  val defaultProbes: Int = 3

  /** Driver-side twin of HashKernels.bloomPosition (BloomSpec pins
    * bit-identical agreement). */
  def position(g: String, i: Int, mBits: Int): Int = {
    val d = MessageDigest.getInstance("MD5")
      .digest((g + "#" + i).getBytes(UTF_8))
    val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (u % mBits).toInt
  }

  /** Build the filter from a gram list (bounded by benchmark size —
    * the benchGramList contract). mBits must be a multiple of 64. */
  def build(grams: Seq[String], mBits: Int = defaultBits,
      kProbes: Int = defaultProbes): Array[Long] = {
    require(mBits > 0 && mBits % 64 == 0,
      s"mBits must be a positive multiple of 64, got $mBits")
    require(kProbes >= 1, s"kProbes must be >= 1, got $kProbes")
    val bits = new Array[Long](mBits / 64)
    grams.foreach { g =>
      var i = 0
      while (i < kProbes) {
        val p = position(g, i, mBits)
        bits(p >> 6) |= 1L << (p & 63)
        i += 1
      }
    }
    bits
  }

  /** Fraction of bits set — the fill-ratio diagnostic that predicts
    * the FP rate (fill^kProbes under independence). */
  def fillRatio(bits: Array[Long]): Double =
    bits.map(java.lang.Long.bitCount(_).toLong).sum.toDouble /
      (bits.length * 64L)
}
