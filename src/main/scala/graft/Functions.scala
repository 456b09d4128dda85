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
    // session's function registry (incl. float_vector_dot)
    registerKernels(spark)
  }

  /** The compiled kernel surface (graft.expressions): the same
    * KernelRegistry table the GraftExtensions session extension
    * injects, so both registration paths expose identical functions. */
  private def registerKernels(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    graft.expressions.KernelRegistry.all.foreach {
      case (name, _, builder) =>
        reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
