package graft

import graft.SparkSpecBase

class FunctionsSpec extends SparkSpecBase {

  test("registered SQL functions run in spark.sql") {
    Functions.register(spark)
    val refs = spark.sql(
      "SELECT inline(extract_issue_refs('Fixes #5. See owner/lib#9.'))")
      .collect()
    assert(refs.length == 2)
    assert(refs(0).getAs[Long]("number") == 5L)
    assert(refs(0).getAs[Boolean]("has_closing_kw"))
    assert(refs(1).getAs[String]("full_repo") == "owner/lib")
    assert(!refs(1).getAs[Boolean]("has_closing_kw"))

    assert(spark.sql("SELECT one_line(' top \nrest')").head.getString(0)
      == "top")

    assert(spark.sql(
      """SELECT float_vector_dot(array(cast(1 as float), cast(2 as float)),
        |                        array(cast(3 as float), cast(4 as float)))"""
        .stripMargin).head.getDouble(0) == 11.0)

    // stable_hash_id over a struct is field-order invariant in SQL too
    val h = spark.sql(
      """SELECT stable_hash_id(named_struct('a', 1, 'b', 'x')) AS h1,
        |       stable_hash_id(named_struct('b', 'x', 'a', 1)) AS h2""".stripMargin)
      .head
    assert(h.getString(0) == h.getString(1))
  }

  test("non-literal kernel size parameter fails analysis readably") {
    Functions.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """SELECT minhash_signature(array('a'), cast(id AS int))
          |FROM range(1)""".stripMargin).collect()
    }
    assert(e.getMessage.contains("integer literal"), e.getMessage)
  }
}
