package graft

import org.apache.spark.sql.{Row, SparkSession}

import graft.ops.{CanonicalJson, TextRefs}

/** SQL-surface registration: exposes the engine's scalar ops to
  * `spark.sql` so the entity tables can be queried with plain SQL
  * (the analytics entry point of SURVEY §3.3). Column-composition
  * operators (linkers, dedup, blame) stay DataFrame transforms —
  * they are multi-relation pipelines, not scalar functions.
  */
object Functions {

  def register(spark: SparkSession): Unit = {
    spark.udf.register("extract_issue_refs",
      (text: String) => TextRefs.extractIssueRefs(text))
    spark.udf.register("extract_cross_repo_refs",
      (text: String) => TextRefs.extractCrossRepoRefs(text))
    spark.udf.register("one_line",
      (msg: String) => TextRefs.oneLine(msg))
    spark.udf.register("has_closing_kw",
      (text: String) => TextRefs.hasClosingKeyword(text))
    spark.udf.register("canonical_json",
      (r: Row) => CanonicalJson.canonicalize(r))
    spark.udf.register("stable_hash_id",
      (r: Row) => CanonicalJson.stableHashId(r))
    // native codegen'd expressions, registered straight into the
    // session's function registry
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_vector_dot",
      exprs => graft.expressions.FloatVectorDot(exprs(0), exprs(1)),
      "scala_udf")
    registerKernels(spark)
  }

  /** The compiled text-hash kernel surface (graft.expressions): int
    * parameters arrive as literal arguments in SQL. */
  private def registerKernels(spark: SparkSession): Unit = {
    import graft.expressions._
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    def intArg(e: Expression): Int =
      e.asInstanceOf[Literal].value.asInstanceOf[Number].intValue()
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("whitespace_tokens",
      exprs => WhitespaceTokens(exprs(0)), "scala_udf")
    reg.createOrReplaceTempFunction("token_shingles",
      exprs => TokenShingles(exprs(0), intArg(exprs(1))), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_signature",
      exprs => MinHashSignature(exprs(0), intArg(exprs(1))), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_bands",
      exprs => MinHashBands(exprs(0), intArg(exprs(1)), intArg(exprs(2))),
      "scala_udf")
    reg.createOrReplaceTempFunction("simhash32",
      exprs => SimHash32(exprs(0)), "scala_udf")
    reg.createOrReplaceTempFunction("kgram_md5",
      exprs => KgramMd5(exprs(0), intArg(exprs(1))), "scala_udf")
    reg.createOrReplaceTempFunction("winnow_min",
      exprs => WinnowMin(exprs(0), intArg(exprs(1))), "scala_udf")
  }
}
