package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions over the compiled `HashKernels` — the
  * dedup/fingerprint pipeline's per-row hot path with whole-stage
  * codegen (the same treatment FloatVectorDot gives the embedding dot
  * product). Each expression is bit-parity-pinned against its
  * interpreted higher-order-function twin by HashExpressionsSpec;
  * both eval and the generated code call the identical static kernel,
  * so interpreted and codegen paths cannot diverge.
  */
private[expressions] trait HashKernelExpression extends UnaryExpression {
  /** array<T> input element check, or StringType for text inputs. */
  protected def inputOk(dt: DataType): Boolean

  protected def inputDescription: String

  override def checkInputDataTypes(): TypeCheckResult =
    if (inputOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires $inputDescription, got " +
        child.dataType.catalogString)
}

private object HashKernelExpression {
  val kernels = "graft.expressions.HashKernels"

  def isStringArray(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }
}

import HashKernelExpression.{isStringArray, kernels}

/** MinHash signature of a shingle set: element s = min over shingles
  * of md5(s + "|" + shingle) as lowercase hex (graft.ops.Dedup
  * determinism contract; reference near-dup semantics per
  * SURVEY §7 scale extensions). */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends HashKernelExpression {
  override protected def inputOk(dt: DataType): Boolean = isStringArray(dt)
  override protected def inputDescription: String = "array<string> shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    HashKernels.minhashSignature(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$kernels.minhashSignature($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** LSH band keys computed directly from the shingle set: band b = md5
  * of the comma-joined hex signature slice [b·r, b·r+r). */
case class MinHashBands(child: Expression, numHashes: Int, bands: Int)
    extends HashKernelExpression {
  override protected def inputOk(dt: DataType): Boolean = isStringArray(dt)
  override protected def inputDescription: String = "array<string> shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    HashKernels.minhashBands(input.asInstanceOf[ArrayData], numHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$kernels.minhashBands($c, $numHashes, $bands)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

/** 32-bit SimHash over (repeated) tokens. */
case class SimHash32(child: Expression) extends HashKernelExpression {
  override protected def inputOk(dt: DataType): Boolean = isStringArray(dt)
  override protected def inputDescription: String = "array<string> tokens"
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override protected def nullSafeEval(input: Any): Any =
    HashKernels.simhash32(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$kernels.simhash32($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** 64-bit SimHash over (repeated) tokens (high 32 bits ≡ simhash32
  * of the same tokens; see HashKernels.simhash64). */
case class SimHash64(child: Expression) extends HashKernelExpression {
  override protected def inputOk(dt: DataType): Boolean = isStringArray(dt)
  override protected def inputDescription: String = "array<string> tokens"
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    HashKernels.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$kernels.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Positional k-token-gram md5 hashes (winnowing input). */
case class KgramMd5(child: Expression, k: Int) extends HashKernelExpression {
  override protected def inputOk(dt: DataType): Boolean = isStringArray(dt)
  override protected def inputDescription: String = "array<string> tokens"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "kgram_md5"

  override protected def nullSafeEval(input: Any): Any =
    HashKernels.kgramMd5(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$kernels.kgramMd5($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): KgramMd5 =
    copy(child = newChild)
}

/** Distinct k-token shingles in first-occurrence order. */
case class TokenShingles(child: Expression, k: Int) extends HashKernelExpression {
  override protected def inputOk(dt: DataType): Boolean = isStringArray(dt)
  override protected def inputDescription: String = "array<string> tokens"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_shingles"

  override protected def nullSafeEval(input: Any): Any =
    HashKernels.tokenShingles(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$kernels.tokenShingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): TokenShingles =
    copy(child = newChild)
}

/** Whitespace tokens of the lowercased text, empties dropped. */
case class WhitespaceTokens(child: Expression) extends HashKernelExpression {
  override protected def inputOk(dt: DataType): Boolean = dt == StringType
  override protected def inputDescription: String = "a string"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "whitespace_tokens"

  override protected def nullSafeEval(input: Any): Any =
    HashKernels.whitespaceTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$kernels.whitespaceTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): WhitespaceTokens =
    copy(child = newChild)
}

/** Winnowing fingerprints: distinct per-window minima over a hash
  * sequence (MOSS-style). */
case class WinnowMin(child: Expression, w: Int) extends HashKernelExpression {
  override protected def inputOk(dt: DataType): Boolean = isStringArray(dt)
  override protected def inputDescription: String = "array<string> hashes"
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "winnow_min"

  override protected def nullSafeEval(input: Any): Any =
    HashKernels.winnowMin(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$kernels.winnowMin($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowMin =
    copy(child = newChild)
}

/** Raw positional n-grams, strict (len < n → empty) — the LM-scoring
  * twin of KgramMd5 (which hashes and collapses short docs). */
case class TokenGrams(child: Expression, n: Int) extends HashKernelExpression {
  override protected def inputOk(dt: DataType): Boolean = isStringArray(dt)
  override protected def inputDescription: String = "array<string> tokens"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_grams"

  override protected def nullSafeEval(input: Any): Any =
    HashKernels.tokenGrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$kernels.tokenGrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): TokenGrams =
    copy(child = newChild)
}

/** Gram-repetition statistics [n_grams, max_freq, dup_positions] over
  * positional n-grams — the per-row kernel behind the repetition
  * quality filter (no explode, no shuffle; see
  * HashKernels.gramRepetitionStats for the exact contract). */
case class GramRepetitionStats(child: Expression, n: Int)
    extends HashKernelExpression {
  override protected def inputOk(dt: DataType): Boolean = isStringArray(dt)
  override protected def inputDescription: String = "array<string> tokens"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_repetition_stats"

  override protected def nullSafeEval(input: Any): Any =
    HashKernels.gramRepetitionStats(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$kernels.gramRepetitionStats($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): GramRepetitionStats =
    copy(child = newChild)
}

/** Count (with repeats) of tokens contained in a fixed word set — the
  * stopword-hit counter of the language-ID / quality-score path, as a
  * compiled set-lookup pass. */
case class StopwordHits(child: Expression, words: Seq[String])
    extends HashKernelExpression {
  override protected def inputOk(dt: DataType): Boolean = isStringArray(dt)
  override protected def inputDescription: String = "array<string> tokens"
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "stopword_hits"

  @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    HashKernels.countIn(input.asInstanceOf[ArrayData], wordSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopwords", wordSet,
      classOf[java.util.HashSet[_]].getName)
    defineCodeGen(ctx, ev, c => s"$kernels.countIn($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordHits =
    copy(child = newChild)
}

/** Sloppy-phrase [freq, matches] over slot-shifted position lists —
  * the Lucene SloppyPhraseMatcher greedy traversal as a compiled
  * per-row pass (reordering allowed, 1/(matchLength+1) freq
  * weighting; see HashKernels.sloppyPhraseStats for the exact
  * contract). Input: array<array<int>>, one sorted shifted list per
  * phrase slot. `rpts = true` switches the same-term collision
  * policy to Lucene's repeat-group advance
  * (HashKernels.sloppyPhraseStatsRpts); the default keeps the
  * mover-skips rule every gated query ships with. */
case class SloppyPhraseStats(child: Expression, slop: Int,
    rpts: Boolean = false)
    extends HashKernelExpression {
  override protected def inputOk(dt: DataType): Boolean = dt match {
    case ArrayType(ArrayType(org.apache.spark.sql.types.IntegerType, _), _) =>
      true
    case _ => false
  }
  override protected def inputDescription: String =
    "array<array<int>> shifted position lists"
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def prettyName: String = "sloppy_phrase_stats"

  private def kernel: String =
    if (rpts) "sloppyPhraseStatsRpts" else "sloppyPhraseStats"

  override protected def nullSafeEval(input: Any): Any =
    if (rpts)
      HashKernels.sloppyPhraseStatsRpts(input.asInstanceOf[ArrayData], slop)
    else
      HashKernels.sloppyPhraseStats(input.asInstanceOf[ArrayData], slop)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$kernels.$kernel($c, $slop)")

  override protected def withNewChildInternal(newChild: Expression): SloppyPhraseStats =
    copy(child = newChild)
}

/** Raw-text `<em>` highlighting with character offsets — wraps each
  * letter/digit token whose lowercase form is a query term, in place
  * in the ORIGINAL text (tag-strip round-trips to the raw value; see
  * HashKernels.highlightRaw). */
case class HighlightRawTerms(child: Expression, terms: Seq[String])
    extends HashKernelExpression {
  override protected def inputOk(dt: DataType): Boolean =
    dt == StringType
  override protected def inputDescription: String = "string text"
  override def dataType: DataType = StringType
  override def prettyName: String = "highlight_raw"

  @transient private lazy val termSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    terms.foreach(t =>
      s.add(UTF8String.fromString(t.toLowerCase(java.util.Locale.ROOT))))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    HashKernels.highlightRaw(input.asInstanceOf[UTF8String], termSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("highlightTerms", termSet,
      classOf[java.util.HashSet[_]].getName)
    defineCodeGen(ctx, ev, c => s"$kernels.highlightRaw($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): HighlightRawTerms =
    copy(child = newChild)
}

/** Count of grams whose Bloom positions are all set — the probe side
  * of Bloom-filter decontamination. `bits` is the driver-built filter
  * (graft.ops.BloomFilter.build over the benchmark's gram set),
  * embedded as a codegen reference object: FIXED size (m bits)
  * regardless of how large the benchmark grows — the artifact that
  * replaces q57's exact gram-set broadcast at scale. */
case class BloomHitCount(child: Expression, bits: Array[Long],
    kProbes: Int) extends HashKernelExpression {
  override protected def inputOk(dt: DataType): Boolean = isStringArray(dt)
  override protected def inputDescription: String = "array<string> grams"
  override def dataType: DataType = LongType
  override def prettyName: String = "bloom_hit_count"

  override protected def nullSafeEval(input: Any): Any =
    HashKernels.bloomHitCount(input.asInstanceOf[ArrayData], bits, kProbes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev, c => s"$kernels.bloomHitCount($c, $bitsRef, $kProbes)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomHitCount =
    copy(child = newChild)
}

/** Σ character length over a token array (mean-token-length numerator). */
case class TokenLengthSum(child: Expression) extends HashKernelExpression {
  override protected def inputOk(dt: DataType): Boolean = isStringArray(dt)
  override protected def inputDescription: String = "array<string> tokens"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "token_length_sum"

  override protected def nullSafeEval(input: Any): Any =
    HashKernels.tokenLengthSum(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("s")
      s"""
         |java.lang.Long $boxed = $kernels.tokenLengthSum($c);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenLengthSum =
    copy(child = newChild)
}

/** Exact Jaccard similarity of two array<string> columns — the
  * near-dup verify step — as one compiled pass (hash-set intersection
  * / union sizes) instead of two interpreted array traversals. */
case class ArrayJaccard(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (isStringArray(left.dataType) && isStringArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "array_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("j")
      s"""
         |java.lang.Double $boxed = $kernels.jaccard($a, $b);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayJaccard =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points for the kernel expressions. */
object TextHashes {
  private def c(e: Expression): Column = Shim.column(e)
  private def e(col: Column): Expression = Shim.expression(col)

  def whitespaceTokens(text: Column): Column = c(WhitespaceTokens(e(text)))
  def tokenShingles(toks: Column, k: Int): Column = c(TokenShingles(e(toks), k))
  def minhashSignature(sh: Column, numHashes: Int): Column =
    c(MinHashSignature(e(sh), numHashes))
  def minhashBands(sh: Column, numHashes: Int, bands: Int): Column =
    c(MinHashBands(e(sh), numHashes, bands))
  def simhash32(toks: Column): Column = c(SimHash32(e(toks)))
  def simhash64(toks: Column): Column = c(SimHash64(e(toks)))
  def kgramMd5(toks: Column, k: Int): Column = c(KgramMd5(e(toks), k))
  def gramRepetitionStats(toks: Column, n: Int): Column =
    c(GramRepetitionStats(e(toks), n))
  def tokenGrams(toks: Column, n: Int): Column = c(TokenGrams(e(toks), n))
  def winnowMin(hashes: Column, w: Int): Column = c(WinnowMin(e(hashes), w))
  def arrayJaccard(a: Column, b: Column): Column =
    c(ArrayJaccard(e(a), e(b)))
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    c(StopwordHits(e(toks), words))
  def bloomHitCount(grams: Column, bits: Array[Long], kProbes: Int): Column =
    c(BloomHitCount(e(grams), bits, kProbes))
  def tokenLengthSum(toks: Column): Column = c(TokenLengthSum(e(toks)))
  def sloppyPhraseStats(posLists: Column, slop: Int,
      rpts: Boolean = false): Column =
    c(SloppyPhraseStats(e(posLists), slop, rpts))
  def highlightRaw(text: Column, terms: Seq[String]): Column =
    c(HighlightRawTerms(e(text), terms))
}
