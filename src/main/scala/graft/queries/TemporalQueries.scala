package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.io.Tables
import graft.ops.{AsofJoin, RangeJoin}

/** Temporal join queries over the `events` table — the two join shapes
  * SQL can only state as inequality joins (quadratic if executed as
  * written) and the engine executes as one-shuffle plans: point-in-time
  * as-of lookup (AsofJoin) and binned point-in-interval overlap
  * (RangeJoin). The DuckDB oracles ARE the naive inequality joins, so
  * parity proves the scalable plans compute identical semantics.
  */
object TemporalQueries {

  private val dec4 = DecimalType(18, 4)

  /** For each click, the most recent at-or-before purchase by the same
    * user (ties → greatest purchase id), clicks with no prior purchase
    * kept with null payload. One shuffle on user_id, no join node. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"),
        $"ts".as("purchase_ts"), $"value".as("purchase_value"))
    AsofJoin.leftAsof(clicks, purchases, Seq("user_id"),
      leftTime = "ts", rightTime = "purchase_ts",
      rightTies = Seq("purchase_id"))
      .select($"event_id", $"user_id",
        unix_micros($"ts").as("ts_us"), $"purchase_id",
        unix_micros($"purchase_ts").as("purchase_ts_us"),
        $"purchase_value")
      .orderBy($"event_id")
  }

  /** Events falling in any purchase's 30-minute attribution window
    * [purchase ts, +30 min), aggregated per window. No equality key
    * exists, so the naive form is a nested-loop self-join; the binned
    * plan equi-joins on a 30-minute bin id instead. */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val binMicros = 30L * 60 * 1000000
    val ev = Tables.events(spark, dir)
    val windows = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"ts".as("lo"),
        ($"ts" + expr("INTERVAL 30 MINUTES")).as("hi"))
    val points = ev.select($"event_id", $"ts", $"value")
    RangeJoin.pointInInterval(points, windows, "ts", "lo", "hi", binMicros)
      .groupBy($"purchase_id")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast(dec4)).cast("double").as("sum_value"))
      .orderBy($"purchase_id")
  }

  val oracles: Map[String, String] = Map(
    "q45_asof_join" ->
      """WITH clicks AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |purch AS (SELECT user_id, event_id AS purchase_id,
        |    ts AS purchase_ts, value AS purchase_value
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT c.event_id, c.user_id, c.ts, p.purchase_id,
        |    p.purchase_ts, p.purchase_value,
        |    row_number() OVER (PARTITION BY c.event_id
        |      ORDER BY p.purchase_ts DESC, p.purchase_id DESC) AS rn
        |  FROM clicks c LEFT JOIN purch p
        |    ON p.user_id = c.user_id AND p.purchase_ts <= c.ts)
        |SELECT event_id, user_id, epoch_us(ts) AS ts_us, purchase_id,
        |  epoch_us(purchase_ts) AS purchase_ts_us, purchase_value
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "q46_range_join" ->
      """WITH w AS (SELECT event_id AS purchase_id, ts AS lo,
        |    ts + INTERVAL 30 MINUTE AS hi
        |  FROM events WHERE event_type = 'purchase')
        |SELECT purchase_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM w JOIN events e ON e.ts >= w.lo AND e.ts < w.hi
        |GROUP BY purchase_id ORDER BY purchase_id""".stripMargin,
  )
}
