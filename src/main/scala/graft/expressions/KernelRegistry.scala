package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** The single name → builder table for every native kernel expression,
  * consumed by BOTH registration paths (`graft.Functions.register` and
  * the `graft.GraftExtensions` session extension) so the two SQL
  * surfaces cannot drift. */
object KernelRegistry {

  /** Integer parameters (shingle size, signature width, band count)
    * shape the kernel's compiled loop, so they must be literals at
    * registration time. A column argument fails analysis with a
    * readable error instead of a ClassCastException. */
  private def intArg(e: Expression): Int = e match {
    case Literal(v: Number, _) => v.intValue()
    case other => throw new org.apache.spark.sql.AnalysisException(
      "INVALID_PARAMETER_VALUE.INTEGER",
      Map("parameter" -> "n", "functionName" -> "graft kernel function",
        "invalidValue" -> other.sql),
      None)
  }

  /** String parameters (the highlight term list) follow the same
    * literal discipline as [[intArg]]. */
  private def strArg(e: Expression): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
      v.toString
    case other => throw new org.apache.spark.sql.AnalysisException(
      "INVALID_PARAMETER_VALUE.STRING",
      Map("parameter" -> "s", "functionName" -> "graft kernel function",
        "invalidValue" -> other.sql),
      None)
  }

  /** A natural CSV argument ("fast, vector") trims to its terms —
    * an untrimmed split would hunt for the term " vector", which no
    * tokenizer ever emits. Empty segments (trailing commas, ",,")
    * drop. */
  private def csvTerms(s: String): Seq[String] =
    s.split(",").toSeq.map(_.trim).filter(_.nonEmpty)

  /** (name, usage, builder) for every kernel expression. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("sloppy_phrase_stats",
      "_FUNC_(posLists, slop) - [sloppy freq, matches] over shifted position lists",
      exprs => SloppyPhraseStats(exprs(0), intArg(exprs(1)))),
    ("highlight_raw",
      "_FUNC_(text, csvTerms) - <em> wrapping at raw character offsets",
      exprs => HighlightRawTerms(exprs(0),
        csvTerms(strArg(exprs(1))))),
    ("float_vector_dot", "_FUNC_(a, b) - dot product of float vectors",
      exprs => FloatVectorDot(exprs(0), exprs(1))),
    ("whitespace_tokens", "_FUNC_(text) - lowercased tokens",
      exprs => WhitespaceTokens(exprs(0))),
    ("token_shingles", "_FUNC_(tokens, k) - distinct k-grams",
      exprs => TokenShingles(exprs(0), intArg(exprs(1)))),
    ("minhash_signature", "_FUNC_(shingles, n) - MinHash signature",
      exprs => MinHashSignature(exprs(0), intArg(exprs(1)))),
    ("minhash_bands", "_FUNC_(shingles, n, b) - LSH band keys",
      exprs => MinHashBands(exprs(0), intArg(exprs(1)), intArg(exprs(2)))),
    ("simhash32", "_FUNC_(tokens) - 32-bit SimHash",
      exprs => SimHash32(exprs(0))),
    ("simhash64", "_FUNC_(tokens) - 64-bit SimHash",
      exprs => SimHash64(exprs(0))),
    ("kgram_md5", "_FUNC_(tokens, k) - positional k-gram md5s",
      exprs => KgramMd5(exprs(0), intArg(exprs(1)))),
    ("winnow_min", "_FUNC_(hashes, w) - winnowing fingerprints",
      exprs => WinnowMin(exprs(0), intArg(exprs(1)))),
    ("array_jaccard", "_FUNC_(a, b) - exact Jaccard of string arrays",
      exprs => ArrayJaccard(exprs(0), exprs(1))),
    ("token_length_sum", "_FUNC_(tokens) - total character length",
      exprs => TokenLengthSum(exprs(0))))
}
