package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

case class Ev(event_id: Long, ts: Timestamp, event_type: String,
    value: Double)

class StreamsSpec extends SparkSpecBase {

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  private def runBatches[A](query: org.apache.spark.sql.DataFrame,
      name: String)(feed: => Unit): Unit = {
    val q = query.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try { feed; q.processAllAvailable() } finally q.stop()
  }

  test("windowedRollup emits closed windows after watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Ev]
    val out = Streams.windowedRollup(
      src.toDF().select($"ts", $"event_type", $"value"),
      windowLen = "10 minutes", lateness = "5 minutes")
    runBatches(out, "rollup") {
      src.addData(
        Ev(1, t("2020-01-01 00:01:00"), "click", 1.0),
        Ev(2, t("2020-01-01 00:04:00"), "click", 2.0),
        Ev(3, t("2020-01-01 00:11:00"), "view", 5.0))
      // advance event time far enough to close the first two windows
      src.addData(Ev(4, t("2020-01-01 01:00:00"), "view", 1.0))
    }
    val rows = spark.table("rollup")
      .select($"window_start".cast("string"), $"event_type", $"n_events",
        $"sum_value")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(rows.contains(("2020-01-01 00:00:00", "click", 2L, 3.0)))
    assert(rows.contains(("2020-01-01 00:10:00", "view", 1L, 5.0)))
  }

  test("dedupStream drops key replays within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Ev]
    val out = Streams.dedupStream(src.toDF(), "event_id")
    runBatches(out, "dedup") {
      src.addData(
        Ev(1, t("2020-01-01 00:00:00"), "click", 1.0),
        Ev(1, t("2020-01-01 00:00:30"), "click", 1.0), // replay
        Ev(2, t("2020-01-01 00:01:00"), "view", 2.0))
      src.addData(Ev(1, t("2020-01-01 00:02:00"), "click", 9.0)) // replay
    }
    val ids = spark.table("dedup").select("event_id").collect()
      .map(_.getLong(0)).toSeq.sorted
    assert(ids == Seq(1L, 2L))
  }

  test("latestPerKey keeps newest value per key across triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Streams.KeyedValue]
    val out = Streams.latestPerKey(src.toDS())
    runBatches(out.toDF(), "latest") {
      src.addData(
        Streams.KeyedValue(1L, t("2020-01-01 00:00:00"), 10.0),
        Streams.KeyedValue(1L, t("2020-01-01 00:05:00"), 20.0))
      src.addData(Streams.KeyedValue(1L, t("2020-01-01 00:03:00"), 15.0))
    }
    // per-trigger emissions: batch1 newest=20.0; batch2 newest still
    // 20.0 (the 00:03 record is older than the held state)
    val vals = spark.table("latest").as[Streams.KeyedValue].collect()
      .map(_.value).toSeq
    assert(vals.nonEmpty && vals.forall(_ == 20.0))
  }
}
