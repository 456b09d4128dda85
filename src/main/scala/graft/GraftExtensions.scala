package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.expressions._

/** Spark extension entry point: ship the engine's native expressions
  * into any session via
  * `spark.sql.extensions=graft.GraftExtensions` — the idiomatic way a
  * library injects Catalyst surface without application code calling a
  * register function (graft.Functions.register remains for
  * programmatic use and also wires the Scala-UDF layer).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression): Int =
    e.asInstanceOf[Literal].value.asInstanceOf[Number].intValue()

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, usage: String,
        builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage),
        builder))

    inject("float_vector_dot", "_FUNC_(a, b) - dot product of float vectors",
      exprs => FloatVectorDot(exprs(0), exprs(1)))
    inject("whitespace_tokens", "_FUNC_(text) - lowercased tokens",
      exprs => WhitespaceTokens(exprs(0)))
    inject("token_shingles", "_FUNC_(tokens, k) - distinct k-grams",
      exprs => TokenShingles(exprs(0), intArg(exprs(1))))
    inject("minhash_signature", "_FUNC_(shingles, n) - MinHash signature",
      exprs => MinHashSignature(exprs(0), intArg(exprs(1))))
    inject("minhash_bands", "_FUNC_(shingles, n, b) - LSH band keys",
      exprs => MinHashBands(exprs(0), intArg(exprs(1)), intArg(exprs(2))))
    inject("simhash32", "_FUNC_(tokens) - 32-bit SimHash",
      exprs => SimHash32(exprs(0)))
    inject("kgram_md5", "_FUNC_(tokens, k) - positional k-gram md5s",
      exprs => KgramMd5(exprs(0), intArg(exprs(1))))
    inject("winnow_min", "_FUNC_(hashes, w) - winnowing fingerprints",
      exprs => WinnowMin(exprs(0), intArg(exprs(1))))
    inject("array_jaccard", "_FUNC_(a, b) - exact Jaccard of string arrays",
      exprs => ArrayJaccard(exprs(0), exprs(1)))
    inject("token_length_sum", "_FUNC_(tokens) - total character length",
      exprs => TokenLengthSum(exprs(0)))
  }
}
