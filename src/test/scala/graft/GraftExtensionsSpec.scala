package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** `spark.sql.extensions=graft.GraftExtensions` must make the native
  * kernels resolvable by name. Exercised at the registry level (the
  * exact mechanism session construction uses) rather than a fresh
  * SparkSession — the test JVM shares one session, and getOrCreate
  * would silently hand back the extension-less singleton. */
class GraftExtensionsSpec extends AnyFunSuite {

  private val registry: FunctionRegistry = {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    Shim.registerFunctions(ext, FunctionRegistry.builtin.clone())
  }

  private def build(name: String,
      args: org.apache.spark.sql.catalyst.expressions.Expression*) =
    registry.lookupFunctionBuilder(FunctionIdentifier(name)).get(args)

  test("all kernel functions are injected and evaluate") {
    for (name <- Seq("float_vector_dot", "whitespace_tokens",
        "token_shingles", "minhash_signature", "minhash_bands", "simhash32",
        "simhash64", "kgram_md5", "winnow_min", "array_jaccard",
        "token_length_sum")) {
      assert(registry.functionExists(FunctionIdentifier(name)), name)
    }

    val text = Literal.create("a b c d e")
    val toks = build("whitespace_tokens", text)
    val sig = build("minhash_signature",
      build("token_shingles", toks, Literal(3)), Literal(16))
    assert(sig.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .numElements() == 16)

    assert(build("simhash32", toks).eval().isInstanceOf[Long])
    assert(build("simhash64", toks).eval().isInstanceOf[Long])

    def floats(xs: Float*) = Literal.create(
      new GenericArrayData(xs.toArray.map(_.asInstanceOf[Any])),
      ArrayType(FloatType, containsNull = false))
    assert(build("float_vector_dot",
      floats(1f, 2f), floats(3f, 4f)).eval() == 11.0)

    def strs(xs: String*) = Literal.create(
      new GenericArrayData(xs.toArray.map(s =>
        UTF8String.fromString(s).asInstanceOf[Any])),
      ArrayType(org.apache.spark.sql.types.StringType, containsNull = false))
    assert(math.abs(build("array_jaccard", strs("x", "y"), strs("y", "z"))
      .eval().asInstanceOf[Double] - 1.0 / 3.0) < 1e-12)
    assert(build("token_length_sum", strs("ab", "c")).eval() == 3L)
  }
}
