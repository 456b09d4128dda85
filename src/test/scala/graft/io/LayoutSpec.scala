package graft.io

import graft.SparkSpecBase

class LayoutSpec extends SparkSpecBase {

  test("joins on co-bucketed tables plan no Exchange") {
    import spark.implicits._
    val facts = spark.range(10000)
      .select(($"id" % 500).as("k"), $"id".as("v"))
    val dims = spark.range(500).select($"id".as("k"), ($"id" * 2).as("w"))
    try {
      Layout.writeBucketed(facts, "t_facts_bucketed", Seq("k"), 8)
      Layout.writeBucketed(dims, "t_dims_bucketed", Seq("k"), 8)
      val joined = spark.table("t_facts_bucketed")
        .join(spark.table("t_dims_bucketed"), Seq("k"))
      // disable broadcast so the join would otherwise shuffle both sides
      val plan = withNoBroadcast {
        joined.queryExecution.executedPlan.toString
      }
      assert(!plan.contains("Exchange"), plan)
      assert(withNoBroadcast { joined.count() } == 10000L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS t_facts_bucketed")
      spark.sql("DROP TABLE IF EXISTS t_dims_bucketed")
    }
  }

  private def withNoBroadcast[A](f: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try f finally spark.conf.set(key, old)
  }
}
