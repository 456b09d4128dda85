package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpecBase

class TemporalJoinSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val leftT = StructType(Seq(
    StructField("id", LongType), StructField("k", LongType),
    StructField("t", TimestampType)))
  private val rightT = StructType(Seq(
    StructField("k", LongType), StructField("rid", LongType),
    StructField("rt", TimestampType), StructField("v", DoubleType)))

  private def leftDf(rows: (Long, Long, String)*) =
    spark.createDataFrame(spark.sparkContext.parallelize(
      rows.map(r => Row(r._1, r._2, ts(r._3))), 2), leftT)
  private def rightDf(rows: (Long, Long, String, Double)*) =
    spark.createDataFrame(spark.sparkContext.parallelize(
      rows.map(r => Row(r._1, r._2, ts(r._3), r._4)), 2), rightT)

  private def collectAsof(df: DataFrame): Map[Long, Option[Long]] =
    df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap

  test("leftAsof picks the latest at-or-before row per key") {
    val l = leftDf((1L, 10L, "2024-01-01 12:00:00"),
      (2L, 10L, "2024-01-01 09:00:00"),
      (3L, 20L, "2024-01-01 12:00:00"),
      (4L, 30L, "2024-01-01 12:00:00")) // key with no right rows
    val r = rightDf(
      (10L, 100L, "2024-01-01 08:00:00", 1.0),
      (10L, 101L, "2024-01-01 11:00:00", 2.0),
      (10L, 102L, "2024-01-01 13:00:00", 3.0), // after both clicks
      (20L, 200L, "2024-01-01 12:00:00", 4.0)) // exactly-equal ts
    val out = collectAsof(AsofJoin.leftAsof(l, r, Seq("k"), "t", "rt",
      rightTies = Seq("rid")))
    assert(out == Map(1L -> Some(101L), 2L -> Some(100L),
      3L -> Some(200L), 4L -> None))
  }

  test("strict mode excludes the exactly-equal instant") {
    val l = leftDf((1L, 20L, "2024-01-01 12:00:00"))
    val r = rightDf((20L, 200L, "2024-01-01 12:00:00", 4.0),
      (20L, 201L, "2024-01-01 11:00:00", 5.0))
    val inclusive = collectAsof(AsofJoin.leftAsof(l, r, Seq("k"), "t", "rt",
      rightTies = Seq("rid")))
    val strict = collectAsof(AsofJoin.leftAsof(l, r, Seq("k"), "t", "rt",
      rightTies = Seq("rid"), strict = true))
    assert(inclusive(1L) == Some(200L))
    assert(strict(1L) == Some(201L))
  }

  test("right-side ties resolve to the greatest tie tuple") {
    val l = leftDf((1L, 10L, "2024-01-01 12:00:00"))
    val r = rightDf((10L, 7L, "2024-01-01 10:00:00", 1.0),
      (10L, 9L, "2024-01-01 10:00:00", 2.0),
      (10L, 8L, "2024-01-01 10:00:00", 3.0))
    val out = AsofJoin.leftAsof(l, r, Seq("k"), "t", "rt",
      rightTies = Seq("rid")).collect().head
    assert(out.getLong(3) == 9L && out.getDouble(5) == 2.0)
  }

  test("leftAsof plans with no join node (one shuffle, window sweep)") {
    val l = leftDf((1L, 10L, "2024-01-01 12:00:00"))
    val r = rightDf((10L, 100L, "2024-01-01 08:00:00", 1.0))
    val plan = AsofJoin.leftAsof(l, r, Seq("k"), "t", "rt")
      .queryExecution.executedPlan
    def joins(p: SparkPlan): Seq[SparkPlan] = p.collect {
      case j: BaseJoinExec => j
      case a: AdaptiveSparkPlanExec => a // descend below AQE
    }.flatMap {
      case a: AdaptiveSparkPlanExec => joins(a.executedPlan)
      case j => Seq(j)
    }
    assert(joins(plan).isEmpty, s"expected join-free plan:\n$plan")
  }

  test("leftAsof stays exact when one hot key dominates both sides") {
    // Skew shape from the scaladoc: one key carries ~95% of all rows
    // (plus a couple of cold keys as canaries), so its whole history
    // lands in one sort partition. Correctness must not depend on the
    // distribution; expected values come from a driver-side binary
    // search over the sorted right history.
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val hotLeft = (1L to 2000L).map(i =>
      (i, 1L, 1700000000L + rnd.nextInt(1000000).toLong))
    val coldLeft = Seq((9001L, 2L, 1700000500L), (9002L, 3L, 1700000500L))
    val hotRight = (1L to 2000L).map(i =>
      (1L, i, 1700000000L + rnd.nextInt(1000000).toLong, i.toDouble))
    val coldRight = Seq((2L, 5000L, 1700000400L, 1.0)) // key 3: no rows
    val l = (hotLeft ++ coldLeft).toDF("id", "k", "epoch")
      .select($"id", $"k", $"epoch".cast("timestamp").as("t"))
      .repartition(8)
    val r = (hotRight ++ coldRight).toDF("k", "rid", "repoch", "v")
      .select($"k", $"rid", $"repoch".cast("timestamp").as("rt"), $"v")
      .repartition(8)
    val got = AsofJoin.leftAsof(l, r, Seq("k"), "t", "rt",
      rightTies = Seq("rid")).collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(3)) None else Some(row.getLong(3)))).toMap
    // expected: greatest (rt, rid) with rt <= t, per key
    val byKey = (hotRight ++ coldRight).groupBy(_._1)
      .map { case (k, rs) => k -> rs.map(x => (x._3, x._2)).sorted }
    val expected = (hotLeft ++ coldLeft).map { case (id, k, t) =>
      id -> byKey.get(k).flatMap(
        _.takeWhile(_._1 <= t).lastOption.map(_._2))
    }.toMap
    assert(got.size == 2002)
    assert(got == expected)
    assert(got(9002L).isEmpty) // key with no right history
  }

  test("leftAsofBucketed equals leftAsof across bucket widths") {
    // Random two-key data plus a 95%-hot key; compare the bucketed
    // rewrite to the single-sweep reference at widths spanning
    // "every row its own bucket" → "one bucket for everything"
    // (the latter degenerates to the plain sweep), in both inclusive
    // and strict modes.
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val lRows = ((1L to 800L).map(i =>
      (i, if (i <= 760) 1L else 2L, 1700000000L + rnd.nextInt(100000))) :+
      ((9001L, 3L, 1700000000L))) // key with no right rows
    val rRows = (1L to 800L).map(i =>
      (if (i <= 760) 1L else 2L, i, 1700000000L + rnd.nextInt(100000),
        i.toDouble))
    val l = lRows.toDF("id", "k", "epoch")
      .select($"id", $"k", $"epoch".cast("timestamp").as("t"))
      .repartition(8)
    val r = rRows.toDF("k", "rid", "repoch", "v")
      .select($"k", $"rid", $"repoch".cast("timestamp").as("rt"), $"v")
      .repartition(8)
    // null-keyed history in a DIFFERENT bucket than its left row:
    // leftAsof groups null keys (window semantics), so the bucketed
    // rewrite's re-join must be null-safe or the carry is lost
    // (round-6 review finding)
    val lNull = l.unionByName(Seq((9100L, 1700009000L)).toDF("id", "epoch")
      .select($"id", lit(null).cast("long").as("k"),
        $"epoch".cast("timestamp").as("t")))
    val rNull = r.unionByName(Seq((9200L, 1700000100L, 42.0))
      .toDF("rid", "repoch", "v")
      .select(lit(null).cast("long").as("k"), $"rid",
        $"repoch".cast("timestamp").as("rt"), $"v"))
    def collectMap(df: DataFrame): Map[Long, Option[Long]] =
      df.collect().map(row => row.getLong(0) ->
        (if (row.isNullAt(3)) None else Some(row.getLong(3)))).toMap
    for (strict <- Seq(false, true)) {
      val reference = collectMap(AsofJoin.leftAsof(lNull, rNull, Seq("k"),
        "t", "rt", rightTies = Seq("rid"), strict = strict))
      assert(reference(9100L).contains(9200L)) // null-key match exists
      for (bucketSeconds <- Seq(1L, 600L, 7L * 24 * 3600)) {
        val got = collectMap(AsofJoin.leftAsofBucketed(lNull, rNull,
          Seq("k"), "t", "rt", bucketSeconds, rightTies = Seq("rid"),
          strict = strict))
        assert(got == reference, s"strict=$strict bucket=$bucketSeconds")
      }
    }
  }

  test("leftAsof rejects colliding or reserved column names") {
    val l = leftDf((1L, 10L, "2024-01-01 12:00:00"))
    val r = rightDf((10L, 100L, "2024-01-01 08:00:00", 1.0))
    intercept[IllegalArgumentException] {
      AsofJoin.leftAsof(l, r.withColumnRenamed("rid", "id"),
        Seq("k"), "t", "rt")
    }
    intercept[IllegalArgumentException] {
      AsofJoin.leftAsof(l.withColumn("__tag", lit(1)), r, Seq("k"), "t", "rt")
    }
  }

  // ---- RangeJoin ----

  private val pT = StructType(Seq(
    StructField("pid", LongType), StructField("pt", TimestampType)))
  private val iT = StructType(Seq(
    StructField("iid", LongType), StructField("lo", TimestampType),
    StructField("hi", TimestampType)))

  private def pts(rows: (Long, String)*) =
    spark.createDataFrame(spark.sparkContext.parallelize(
      rows.map(r => Row(r._1, ts(r._2))), 2), pT)
  private def ivs(rows: (Long, String, String)*) =
    spark.createDataFrame(spark.sparkContext.parallelize(
      rows.map(r => Row(r._1, ts(r._2), ts(r._3))), 2), iT)

  private def naive(p: DataFrame, iv: DataFrame): Set[(Long, Long)] = {
    val ps = p.collect().map(r => r.getLong(0) -> r.getTimestamp(1))
    val is = iv.collect().map(r =>
      (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
    (for {
      (pid, pt) <- ps; (iid, lo, hi) <- is
      if !pt.before(lo) && pt.before(hi)
    } yield (pid, iid)).toSet
  }

  test("pointInInterval equals the naive inequality join, incl. bounds") {
    val p = pts((1L, "2024-01-01 00:00:00"), // == lo of i1: included
      (2L, "2024-01-01 00:29:59"),
      (3L, "2024-01-01 00:30:00"), // == hi of i1: excluded, == lo of i2
      (4L, "2024-01-01 02:00:00"), // inside the long interval only
      (5L, "2023-12-31 23:59:59")) // before everything
    val iv = ivs((10L, "2024-01-01 00:00:00", "2024-01-01 00:30:00"),
      (11L, "2024-01-01 00:30:00", "2024-01-01 01:00:00"),
      (12L, "2024-01-01 00:15:00", "2024-01-01 03:00:00"), // spans 6+ bins
      (13L, "2024-01-01 01:00:00", "2024-01-01 01:00:00")) // empty: hi==lo
    for (binMin <- Seq(1L, 7L, 30L, 240L)) { // bin ≪, ≈, ≫ interval length
      val got = RangeJoin.pointInInterval(p, iv, "pt", "lo", "hi",
        binMin * 60 * 1000000).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(got == naive(p, iv), s"bin=${binMin}min")
    }
  }

  test("pointInInterval is exact across pre-1970 bin boundaries") {
    // Negative epoch micros: truncating division would shift bins
    // toward zero and lose the boundary match.
    val p = pts((1L, "1969-12-31 23:45:00"), (2L, "1969-12-31 23:00:00"),
      (3L, "1970-01-01 00:15:00"))
    val iv = ivs((10L, "1969-12-31 23:30:00", "1970-01-01 00:30:00"))
    val got = RangeJoin.pointInInterval(p, iv, "pt", "lo", "hi",
      30L * 60 * 1000000).collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got == naive(p, iv))
    assert(got == Set((1L, 10L), (3L, 10L)))
  }

  test("pointInInterval plans no nested-loop or cartesian join") {
    val p = pts((1L, "2024-01-01 00:00:00"))
    val iv = ivs((10L, "2024-01-01 00:00:00", "2024-01-01 00:30:00"))
    val plan = RangeJoin.pointInInterval(p, iv, "pt", "lo", "hi",
      30L * 60 * 1000000).queryExecution.executedPlan
    val bad = plan.collect {
      case j: BroadcastNestedLoopJoinExec => j
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(bad.isEmpty, s"range join fell back to a product plan:\n$plan")
  }
}
