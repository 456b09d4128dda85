package graft.expressions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled per-row kernels for the dedup/fingerprint hot path —
  * tokenize, shingle, MinHash, LSH band keys, SimHash, k-gram hashes,
  * winnowing. Each is bit-identical to the interpreted higher-order-
  * function formulation it replaces (kept in `graft.ops.Dedup` /
  * `graft.ops.TextAnalysis` as the `*Hof` reference forms and pinned
  * by HashExpressionsSpec), but runs as one tight JVM loop per row
  * instead of per-element lambda dispatch: higher-order functions are
  * `CodegenFallback` expressions, so e.g. 16 MinHash seeds × S
  * shingles cost 16·S interpreted md5 subtree evaluations with no
  * common-subexpression elimination — the round-1 bench's single
  * largest cost (q20/q21/q22/q35).
  *
  * Determinism contract (shared with the DuckDB oracles, see
  * Dedup's scaladoc): md5 = lowercase hex over UTF-8 bytes; MinHash
  * minima compare hex strings (≡ unsigned digest bytes); band keys =
  * md5 over the comma-joined hex slice; SimHash token hash = first 8
  * hex chars of md5 as a uint32.
  *
  * All methods are static (Scala object forwarders) so generated
  * whole-stage code can call them directly.
  */
object HashKernels {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val hexDigits = "0123456789abcdef".getBytes(UTF_8)
  private val COMMA = ','.toByte
  private val SPACE = ' '.toByte

  /** UTF-8 bytes of the MinHash seed prefix "s|", precomputed for the
    * seed range any realistic signature width uses. */
  private val seedPrefixes: Array[Array[Byte]] =
    Array.tabulate(128)(s => (s.toString + "|").getBytes(UTF_8))
  private def seedPrefix(s: Int): Array[Byte] =
    if (s < 128) seedPrefixes(s) else (s.toString + "|").getBytes(UTF_8)

  private def hexBytes(d: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    out
  }

  /** a < b over 16-byte digests, unsigned — the same order as
    * comparing their lowercase-hex renderings as strings. */
  private def ltUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Per-seed minimum md5 digests over the non-null shingles: element
    * s = min over shingles of md5(s + "|" + shingle); null when no
    * non-null shingle exists (array_min-over-empty semantics). */
  private def minDigests(sh: ArrayData, numHashes: Int): Array[Array[Byte]] = {
    val md = md5Local.get()
    val mins = new Array[Array[Byte]](numHashes)
    val scratch = new Array[Byte](16)
    val n = sh.numElements()
    var i = 0
    while (i < n) {
      if (!sh.isNullAt(i)) {
        val tok = sh.getUTF8String(i).getBytes
        var s = 0
        while (s < numHashes) {
          md.reset()
          md.update(seedPrefix(s))
          md.update(tok)
          md.digest(scratch, 0, 16)
          if (mins(s) == null) mins(s) = java.util.Arrays.copyOf(scratch, 16)
          else if (ltUnsigned(scratch, mins(s))) {
            System.arraycopy(scratch, 0, mins(s), 0, 16)
          }
          s += 1
        }
      }
      i += 1
    }
    mins
  }

  /** MinHash signature: numHashes lowercase-hex minima. */
  def minhashSignature(sh: ArrayData, numHashes: Int): ArrayData = {
    val mins = minDigests(sh, numHashes)
    val out = new Array[Any](numHashes)
    var s = 0
    while (s < numHashes) {
      out(s) = if (mins(s) == null) null else UTF8String.fromBytes(hexBytes(mins(s)))
      s += 1
    }
    new GenericArrayData(out)
  }

  /** LSH band keys straight from the shingle set: band b = md5 of the
    * comma-joined (concat_ws semantics: nulls skipped) hex signature
    * slice [b·r, b·r+r). */
  def minhashBands(sh: ArrayData, numHashes: Int, bands: Int): ArrayData = {
    val mins = minDigests(sh, numHashes)
    val r = numHashes / bands
    val md = md5Local.get()
    val dig = new Array[Byte](16)
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      md.reset()
      var first = true
      var j = b * r
      val end = j + r
      while (j < end) {
        if (mins(j) != null) {
          if (!first) md.update(COMMA)
          md.update(hexBytes(mins(j)))
          first = false
        }
        j += 1
      }
      md.digest(dig, 0, 16)
      out(b) = UTF8String.fromBytes(hexBytes(dig))
      b += 1
    }
    new GenericArrayData(out)
  }

  /** 32-bit SimHash: per token, h = first 4 md5 digest bytes as a
    * big-endian uint32 (≡ first 8 hex chars); bit i votes +1 when
    * (h >> i) & 1 else -1 (a null token behaves as h = 0, matching the
    * HOF form's null-propagated CASE falling to the -1 branch); result
    * sets bit i when its vote is positive. */
  def simhash32(toks: ArrayData): Long = {
    val md = md5Local.get()
    val dig = new Array[Byte](16)
    val votes = new Array[Int](32)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      var h = 0L
      if (!toks.isNullAt(i)) {
        md.reset()
        md.update(toks.getUTF8String(i).getBytes)
        md.digest(dig, 0, 16)
        h = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
          ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
      }
      var bit = 0
      while (bit < 32) {
        if (((h >> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var res = 0L
    var bit = 0
    while (bit < 32) {
      if (votes(bit) > 0) res |= 1L << bit
      bit += 1
    }
    res
  }

  /** 64-bit SimHash: per token, h = first 8 md5 digest bytes as a
    * big-endian uint64 (≡ first 16 hex chars); bit i votes +1 when
    * (h >> i) & 1 else -1 (nulls vote as h = 0, like simhash32);
    * result sets bit i when its vote is positive. Bit 63 set renders
    * the Long negative — callers treat it as a raw 64-bit pattern.
    *
    * Because the first 4 digest bytes are the HIGH half of h, the
    * high 32 bits of simhash64 equal simhash32 of the same tokens
    * ((simhash64 >>> 32) == simhash32) — HashExpressionsSpec pins
    * that cross-width invariant. */
  def simhash64(toks: ArrayData): Long = {
    val md = md5Local.get()
    val dig = new Array[Byte](16)
    val votes = new Array[Int](64)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      var h = 0L
      if (!toks.isNullAt(i)) {
        md.reset()
        md.update(toks.getUTF8String(i).getBytes)
        md.digest(dig, 0, 16)
        var b = 0
        while (b < 8) {
          h = (h << 8) | (dig(b) & 0xffL)
          b += 1
        }
      }
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var res = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) res |= 1L << bit
      bit += 1
    }
    res
  }

  /** md5 hex of tokens[from, from+len) joined by single spaces,
    * concat_ws-style (null elements skipped, no separator). */
  private def gramMd5(md: MessageDigest, toks: ArrayData, from: Int,
      len: Int, dig: Array[Byte]): UTF8String = {
    md.reset()
    var first = true
    var i = from
    val end = from + len
    while (i < end) {
      if (!toks.isNullAt(i)) {
        if (!first) md.update(SPACE)
        md.update(toks.getUTF8String(i).getBytes)
        first = false
      }
      i += 1
    }
    md.digest(dig, 0, 16)
    UTF8String.fromBytes(hexBytes(dig))
  }

  /** Positional k-token-gram md5 hashes (repeats kept); arrays shorter
    * than k collapse to one gram of all tokens (md5("") when empty). */
  def kgramMd5(toks: ArrayData, k: Int): ArrayData = {
    val md = md5Local.get()
    val dig = new Array[Byte](16)
    val n = toks.numElements()
    if (n >= k) {
      val out = new Array[Any](n - k + 1)
      var i = 0
      while (i <= n - k) {
        out(i) = gramMd5(md, toks, i, k, dig)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      new GenericArrayData(Array[Any](gramMd5(md, toks, 0, n, dig)))
    }
  }

  /** Space-joined token gram [from, from+len), concat_ws semantics. */
  private def gram(toks: ArrayData, from: Int, len: Int): UTF8String = {
    val parts = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      parts(i) = if (toks.isNullAt(from + i)) null
        else toks.getUTF8String(from + i)
      i += 1
    }
    UTF8String.concatWs(UTF8String.fromString(" "), parts: _*)
  }

  /** Distinct k-token shingles in first-occurrence order (the
    * array_distinct contract); short arrays collapse to one shingle of
    * all tokens. */
  def tokenShingles(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n >= k) {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i <= n - k) {
        seen.add(gram(toks, i, k))
        i += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
    } else {
      new GenericArrayData(Array[Any](gram(toks, 0, n)))
    }
  }

  /** Whitespace tokens of the lowercased text, empties dropped —
    * exactly filter(split(lower(text), "\s+"), length > 0): Java
    * regex \s (ASCII), UTF8String.toLowerCase. */
  private val wsPattern = java.util.regex.Pattern.compile("\\s+")
  def whitespaceTokens(text: UTF8String): ArrayData = {
    val parts = wsPattern.split(text.toLowerCase.toString, -1)
    var nonEmpty = 0
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) nonEmpty += 1
      i += 1
    }
    val out = new Array[Any](nonEmpty)
    var j = 0
    i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) {
        out(j) = UTF8String.fromString(parts(i))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Exact Jaccard of two string arrays with builtin parity:
    * size(array_intersect(a,b)) / size(array_union(a,b)) as doubles.
    * Distinct/null handling matches the builtins: intersection =
    * distinct elements present in both (null counts when in both),
    * union = distinct elements of either. Union-empty yields null
    * (the ANSI builtin form raises DIVIDE_BY_ZERO there; unreachable
    * for the engine's by-construction non-empty shingle sets). */
  def jaccard(a: ArrayData, b: ArrayData): java.lang.Double = {
    val setB = new java.util.HashSet[UTF8String]()
    var bHasNull = false
    var i = 0
    val nb = b.numElements()
    while (i < nb) {
      if (b.isNullAt(i)) bHasNull = true else setB.add(b.getUTF8String(i))
      i += 1
    }
    val setA = new java.util.HashSet[UTF8String]()
    var aHasNull = false
    var inter = 0
    i = 0
    val na = a.numElements()
    while (i < na) {
      if (a.isNullAt(i)) aHasNull = true
      else {
        val v = a.getUTF8String(i)
        if (setA.add(v) && setB.contains(v)) inter += 1
      }
      i += 1
    }
    var union = setA.size + setB.size - inter
    if (aHasNull || bHasNull) union += 1
    if (aHasNull && bHasNull) inter += 1
    if (union == 0) null else inter.toDouble / union.toDouble
  }

  /** Count (with repeats) of array elements contained in `words` —
    * the stopword-hit counter, one compiled set-lookup pass instead of
    * an interpreted filter lambda. */
  def countIn(toks: ArrayData, words: java.util.HashSet[UTF8String]): Int = {
    var c = 0
    var i = 0
    val n = toks.numElements()
    while (i < n) {
      if (!toks.isNullAt(i) && words.contains(toks.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** Σ length (character count) over the token array — the
    * mean-token-length numerator, matching aggregate(toks, 0L,
    * (acc, t) => acc + length(t)) incl. its null-propagation (a null
    * element nulls the whole fold). */
  def tokenLengthSum(toks: ArrayData): java.lang.Long = {
    var s = 0L
    var i = 0
    val n = toks.numElements()
    while (i < n) {
      if (toks.isNullAt(i)) return null
      s += toks.getUTF8String(i).numChars()
      i += 1
    }
    s
  }

  /** Raw positional n-grams (space-joined, repeats kept), strict:
    * arrays shorter than n produce an empty array — the bigram-LM
    * scoring input (counts need every occurrence, and a 1-token doc
    * has no bigram evidence). */
  def tokenGrams(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      out(i) = gram(toks, i, n)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Gram-repetition statistics for quality filtering (the Gopher-rule
    * family): over the positional (repeats kept) space-joined n-grams
    * of the token array, returns [n_grams, max_freq, dup_positions] —
    * gram count, the highest frequency of any single gram, and the
    * number of gram POSITIONS whose gram occurs more than once.
    * Arrays shorter than n have no grams → [0, 0, 0] (strict; unlike
    * kgramMd5 there is no short-document collapse — a 2-token doc has
    * no trigram repetition signal). One hash-map pass per row. */
  def gramRepetitionStats(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array[Any](0L, 0L, 0L))
    val counts = new java.util.HashMap[UTF8String, Integer]()
    var i = 0
    while (i <= len - n) {
      val g = gram(toks, i, n)
      val prev = counts.get(g)
      counts.put(g, if (prev == null) 1 else prev.intValue() + 1)
      i += 1
    }
    var maxFreq = 0L
    var dupPositions = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().intValue()
      if (c > maxFreq) maxFreq = c
      if (c > 1) dupPositions += c
    }
    new GenericArrayData(Array[Any]((len - n + 1).toLong, maxFreq, dupPositions))
  }

  /** Winnowing minima: distinct (first-occurrence order) per-window
    * string minima over the hash sequence; windows shorter arrays
    * collapse to one global minimum (null when the array is empty —
    * array_min semantics). */
  def winnowMin(hashes: ArrayData, w: Int): ArrayData = {
    val n = hashes.numElements()
    val arr = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      arr(i) = if (hashes.isNullAt(i)) null else hashes.getUTF8String(i)
      i += 1
    }
    def minRange(from: Int, len: Int): UTF8String = {
      var m: UTF8String = null
      var j = from
      val end = from + len
      while (j < end) {
        val v = arr(j)
        if (v != null && (m == null || v.compareTo(m) < 0)) m = v
        j += 1
      }
      m
    }
    if (n >= w) {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var j = 0
      while (j <= n - w) {
        seen.add(minRange(j, w))
        j += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
    } else {
      new GenericArrayData(Array[Any](minRange(0, n)))
    }
  }

  /** UTF-8 bytes of the Bloom probe suffix "#i", precomputed for the
    * probe range any realistic filter uses. */
  private val probeSuffixes: Array[Array[Byte]] =
    Array.tabulate(16)(i => ("#" + i).getBytes(UTF_8))
  private def probeSuffix(i: Int): Array[Byte] =
    if (i < 16) probeSuffixes(i) else ("#" + i).getBytes(UTF_8)

  /** Probe position i of gram `g` in an m-bit Bloom filter: the
    * uint32 of the first 8 md5 hex chars (≡ first 4 digest bytes,
    * big-endian) of "g#i", mod m — the house md5-prefix construction
    * (Sampling.stableBucket, SimHash token hashes), so any engine
    * with md5 derives the identical position
    * (`('0x' || substr(md5(g || '#' || i), 1, 8))::BIGINT % m` in
    * DuckDB). Mirrored driver-side by graft.ops.BloomFilter.position
    * (BloomSpec pins the agreement). */
  def bloomPosition(md: MessageDigest, g: UTF8String, i: Int,
      mBits: Int): Int = {
    md.reset()
    md.update(g.getBytes)
    md.update(probeSuffix(i))
    val d = md.digest()
    val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (u % mBits).toInt
  }

  /** Sloppy-phrase frequency and match count — the Lucene
    * SloppyPhraseMatcher greedy traversal (the `slop` semantics of ES
    * `match_phrase`, reordering ALLOWED, each match weighted
    * 1/(matchLength+1) — Lucene's `sloppyFreq`).
    *
    * `posLists` is array<array<int>>: per phrase slot j the SORTED
    * slot-SHIFTED positions (document position − j), so an exact
    * occurrence puts every slot at the same shifted value and
    * matchLength = max(shifted) − min(shifted) over an alignment is
    * the phrase's slop distance (a reversed adjacent pair costs 2).
    *
    * The traversal keeps one pointer per slot, repeatedly advances
    * the minimum-shifted-position slot to shrink the current
    * alignment's matchLength, and emits a match (freq +=
    * 1/(matchLength+1)) whenever the advancing pointer overtakes the
    * next-smallest slot — the published greedy algorithm of Lucene's
    * SloppyPhraseScorer. Repeated phrase terms are handled by the
    * distinct-document-position rule: a pointer never rests on a
    * document position another slot currently occupies (two DIFFERENT
    * terms can never collide — a token stream has one term per
    * position — so the rule only ever engages between same-term
    * slots, Lucene's repeats constraint; its full repeat-group
    * machinery is approximated by this skip, documented in
    * FullTextSpec). Ties pop by slot index for determinism.
    *
    * Returns [freq: double, matches: double]; [0, 0] when any slot
    * has no position. One compiled pass over position lists that
    * never leave their row. */
  def sloppyPhraseStats(posLists: ArrayData, slop: Int): ArrayData = {
    val m = posLists.numElements()
    val zero = ArrayData.toArrayData(Array(0.0, 0.0))
    if (m < 2) return zero
    val lists = new Array[Array[Int]](m)
    var j = 0
    while (j < m) {
      if (posLists.isNullAt(j)) return zero
      lists(j) = posLists.getArray(j).toIntArray()
      if (lists(j).length == 0) return zero
      j += 1
    }
    val idx = new Array[Int](m)
    // value(j) = shifted position; document position = value + slot.
    def value(k: Int): Int = lists(k)(idx(k))
    def docPos(k: Int): Int = value(k) + k
    def collidesBelow(k: Int, upTo: Int): Boolean = {
      var o = 0
      var hit = false
      while (!hit && o < upTo) {
        if (o != k && idx(o) < lists(o).length && docPos(o) == docPos(k))
          hit = true
        o += 1
      }
      hit
    }
    def collides(k: Int): Boolean = collidesBelow(k, m)
    // collision-free initial placement: earlier slots keep their
    // spot, each later slot advances off any ALREADY-PLACED position
    // (Lucene's placement order for repeat groups)
    j = 0
    while (j < m) {
      while (idx(j) < lists(j).length && collidesBelow(j, j)) idx(j) += 1
      if (idx(j) >= lists(j).length) return zero
      j += 1
    }
    var end = Int.MinValue
    j = 0
    while (j < m) { if (value(j) > end) end = value(j); j += 1 }
    def argMin(): Int = {
      var best = 0
      var k = 1
      while (k < m) { if (value(k) < value(best)) best = k; k += 1 }
      best
    }
    def minExcept(k: Int): Int = {
      var best = Int.MaxValue
      var o = 0
      while (o < m) {
        if (o != k && value(o) < best) best = value(o)
        o += 1
      }
      best
    }
    var ppJ = argMin()
    var matchLength = end - value(ppJ)
    var next = minExcept(ppJ)
    var freq = 0.0
    var matches = 0.0
    var exhausted = false
    while (!exhausted) {
      // advance the minimum slot, skipping repeat-collision positions
      do idx(ppJ) += 1
      while (idx(ppJ) < lists(ppJ).length && collides(ppJ))
      if (idx(ppJ) >= lists(ppJ).length) exhausted = true
      else {
        if (value(ppJ) > end) end = value(ppJ)
        if (value(ppJ) > next) {
          if (matchLength <= slop) {
            freq += 1.0 / (matchLength + 1)
            matches += 1.0
          }
          ppJ = argMin()
          next = minExcept(ppJ)
          matchLength = end - value(ppJ)
        } else {
          val ml2 = end - value(ppJ)
          if (ml2 < matchLength) matchLength = ml2
        }
      }
    }
    if (matchLength <= slop) {
      freq += 1.0 / (matchLength + 1)
      matches += 1.0
    }
    ArrayData.toArrayData(Array(freq, matches))
  }

  /** [[sloppyPhraseStats]] with Lucene's REPEAT-GROUP ADVANCE as the
    * collision policy (SloppyPhraseMatcher's repeats handling), flag
    * variant behind `sloppy_phrase_stats(..., rpts = true)`:
    *
    * The default kernel's rule is mover-skips — the pointer being
    * advanced skips past any document position another same-term slot
    * occupies. Lucene instead resolves a collision by advancing the
    * pp with the GREATER OFFSET, regardless of which pointer moved:
    * after every advance, while any two slots occupy one document
    * position, the higher slot index steps forward. The observable
    * difference: when a lower slot advances ONTO an occupied
    * position, Lucene evicts the occupant forward and keeps the
    * mover there — which can keep a tighter alignment alive where
    * mover-skips jumps the mover past it (the hand-traced fixtures in
    * FullTextSpec pin exactly such a case). Only same-term slots can
    * ever collide here (one term per token-stream position), so the
    * pairwise rule IS Lucene's simple-repeats constraint — including
    * for phrases repeating SEVERAL distinct terms ("A B A B", two
    * same-term pairs; collisions fire exactly within each term's
    * group because cross-term slots can never share a document
    * position — the multi-group fixtures in HashExpressionsSpec pin
    * Lucene's counts). The bijection/term-group machinery Lucene
    * adds applies only to MULTI-TERM POSITIONS (MultiPhraseQuery —
    * synonym expansion at one slot), which this engine's phrase
    * surface cannot express; documented in SURVEY §9. Emission logic, sloppyFreq
    * weighting, and termination are the default kernel's. */
  def sloppyPhraseStatsRpts(posLists: ArrayData, slop: Int): ArrayData = {
    val m = posLists.numElements()
    val zero = ArrayData.toArrayData(Array(0.0, 0.0))
    if (m < 2) return zero
    val lists = new Array[Array[Int]](m)
    var j = 0
    while (j < m) {
      if (posLists.isNullAt(j)) return zero
      lists(j) = posLists.getArray(j).toIntArray()
      if (lists(j).length == 0) return zero
      j += 1
    }
    val idx = new Array[Int](m)
    def value(k: Int): Int = lists(k)(idx(k))
    def docPos(k: Int): Int = value(k) + k
    // repeat-group advance: while any two slots share a document
    // position, the GREATER slot index steps forward. Every step
    // strictly advances one pointer, so this terminates; false =
    // some list exhausted (no further alignment exists).
    def resolveCollisions(): Boolean = {
      var changed = true
      while (changed) {
        changed = false
        var a = 0
        while (a < m) {
          var b = a + 1
          while (b < m) {
            if (docPos(a) == docPos(b)) {
              idx(b) += 1
              if (idx(b) >= lists(b).length) return false
              changed = true
            }
            b += 1
          }
          a += 1
        }
      }
      true
    }
    if (!resolveCollisions()) return zero
    var end = Int.MinValue
    j = 0
    while (j < m) { if (value(j) > end) end = value(j); j += 1 }
    def argMin(): Int = {
      var best = 0
      var k = 1
      while (k < m) { if (value(k) < value(best)) best = k; k += 1 }
      best
    }
    def minExcept(k: Int): Int = {
      var best = Int.MaxValue
      var o = 0
      while (o < m) {
        if (o != k && value(o) < best) best = value(o)
        o += 1
      }
      best
    }
    var ppJ = argMin()
    var matchLength = end - value(ppJ)
    var next = minExcept(ppJ)
    var freq = 0.0
    var matches = 0.0
    var exhausted = false
    while (!exhausted) {
      idx(ppJ) += 1
      if (idx(ppJ) >= lists(ppJ).length || !resolveCollisions())
        exhausted = true
      else {
        // the eviction may have moved OTHER slots: recompute end —
        // but deliberately NOT `next`. Lucene's SloppyPhraseMatcher
        // reads `next = pq.top().position` ONCE when a window forms
        // and compares against that captured value even after
        // advanceRpts evicts and re-queues colliding pps; refreshing
        // next here would suppress the emission of a completed
        // window whose defining slot was evicted forward — e.g.
        // "A A A A" vs query "A A A" would drop from Lucene's
        // freq 2 to 1 (the 2- and 3-slot repeat fixtures in
        // HashExpressionsSpec pin both counts).
        end = Int.MinValue
        j = 0
        while (j < m) { if (value(j) > end) end = value(j); j += 1 }
        if (value(ppJ) > next) {
          if (matchLength <= slop) {
            freq += 1.0 / (matchLength + 1)
            matches += 1.0
          }
          ppJ = argMin()
          next = minExcept(ppJ)
          matchLength = end - value(ppJ)
        } else {
          val ml2 = end - value(ppJ)
          if (ml2 < matchLength) matchLength = ml2
        }
      }
    }
    if (matchLength <= slop) {
      freq += 1.0 / (matchLength + 1)
      matches += 1.0
    }
    ArrayData.toArrayData(Array(freq, matches))
  }

  /** Raw-text highlighting with CHARACTER offsets — the ES plain
    * highlighter over the ORIGINAL field value: tokens are maximal
    * runs of Unicode letters/digits (exactly the spans
    * FullText.analyze's `[^\p{L}\p{Nd}]+` split produces —
    * Character.isLetter is category L*, Character.isDigit is Nd, the
    * same classes), a token whose ROOT-lowercased form is in `terms`
    * is wrapped `<em>…</em>` IN PLACE, and every non-token character
    * (punctuation, whitespace, markup) passes through untouched — so
    * stripping the tags returns the raw text byte-for-byte
    * (FullTextSpec's round-trip pin). Original casing is preserved
    * inside the tags ("Cat" highlights as "<em>Cat</em>").
    * Code-point iteration keeps supplementary-plane characters
    * intact. One compiled pass per row, no shuffle. */
  def highlightRaw(text: UTF8String,
      terms: java.util.HashSet[UTF8String]): UTF8String = {
    val s = text.toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n + 16)
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      if (Character.isLetter(cp) || Character.isDigit(cp)) {
        val start = i
        var k = i
        var cont = true
        while (cont && k < n) {
          val c = s.codePointAt(k)
          if (Character.isLetter(c) || Character.isDigit(c))
            k += Character.charCount(c)
          else cont = false
        }
        val tok = s.substring(start, k)
        if (terms.contains(UTF8String.fromString(
            tok.toLowerCase(java.util.Locale.ROOT))))
          sb.append("<em>").append(tok).append("</em>")
        else sb.append(tok)
        i = k
      } else {
        sb.appendCodePoint(cp)
        i += Character.charCount(cp)
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Number of grams whose `kProbes` Bloom positions are ALL set in
    * `bits` — the scan-side probe of the Bloom-filter decontamination
    * pass (one compiled loop per row, no explode, no join). Null
    * grams never hit. */
  def bloomHitCount(grams: ArrayData, bits: Array[Long],
      kProbes: Int): Long = {
    val md = md5Local.get()
    val mBits = bits.length * 64
    var hits = 0L
    var gi = 0
    val n = grams.numElements()
    while (gi < n) {
      if (!grams.isNullAt(gi)) {
        val g = grams.getUTF8String(gi)
        var ok = true
        var i = 0
        while (ok && i < kProbes) {
          val p = bloomPosition(md, g, i, mBits)
          ok = (bits(p >> 6) & (1L << (p & 63))) != 0
          i += 1
        }
        if (ok) hits += 1L
      }
      gi += 1
    }
    hits
  }
}
