package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.FullText

object ProbeQ98b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val plan = FullText.bm25PhraseTopK(
        graft.io.Tables.documents(spark, "/root/testdata/sf0.1"),
        "doc_id", "text", Seq("alpha", "beta"), 20)
        .queryExecution.executedPlan.toString
      // count how many times the analyzer and the phrase filter appear
      println("[p98b] filter_lambda occurrences: " +
        "lambdafunction".r.findAllIn(plan).length)
      println("[p98b] split occurrences: " + "split\\(".r.findAllIn(plan).length)
      println("[p98b] plan lines: " + plan.linesIterator.length)
      plan.linesIterator.filter(l => l.contains("Filter") ||
        l.contains("Project") || l.contains("Scan") ||
        l.contains("Exchange") || l.contains("Aggregate") ||
        l.contains("Join")).take(40).foreach(l =>
        println("[p98b] " + l.take(200)))
    } finally spark.stop()
  }
}
