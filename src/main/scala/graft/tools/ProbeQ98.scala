package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.FullText

/** Stage timing for q98's phrase search. */
object ProbeQ98 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[p98] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    try {
      (1 to 2).foreach { round =>
        val top = time(s"top-bigram r$round") {
          graft.io.Tables.documents(spark, sfDir)
            .select(FullText.analyze($"text").as("toks"))
            .filter(size($"toks") >= 2)
            .select(explode(transform(sequence(lit(1), size($"toks") - 1),
              i => concat(element_at($"toks", i), lit(" "),
                element_at($"toks", i + 1)))).as("bg"))
            .groupBy($"bg").agg(count(lit(1)).as("c"))
            .orderBy($"c".desc, $"bg".asc).limit(1)
            .head().getString(0)
        }
        time(s"bm25PhraseTopK r$round") {
          FullText.bm25PhraseTopK(
            graft.io.Tables.documents(spark, sfDir), "doc_id", "text",
            top.split(" ").toSeq, 20).count()
        }
      }
    } finally spark.stop()
  }
}
