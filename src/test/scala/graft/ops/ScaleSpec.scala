package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class ScaleSpec extends SparkSpecBase {

  test("saltedJoin equals the unsalted join on a skewed key") {
    import spark.implicits._
    // hot key: 9000 of 10000 rows share key 1
    val big = spark.range(10000)
      .select(when($"id" < 9000, 1L).otherwise($"id").as("k"),
        $"id".as("payload"))
    val small = Seq((1L, "hot"), (9500L, "cold"), (77L, "missing-from-big"))
      .toDF("k", "label")
    val expected = big.join(small, Seq("k")).groupBy($"label")
      .agg(count(lit(1)).as("n"), sum($"payload").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val salted = Scale.saltedJoin(big, small, "k", 8).groupBy($"label")
      .agg(count(lit(1)).as("n"), sum($"payload").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(salted == expected)
    assert(salted("hot")._1 == 9000L)
  }

  test("saltedJoin left join keeps unmatched big-side rows exactly once") {
    import spark.implicits._
    val big = spark.range(100).select($"id".as("k"), $"id".as("v"))
    val small = Seq((1L, "x")).toDF("k", "label")
    val out = Scale.saltedJoin(big, small, "k", 4, "left")
    assert(out.count() == 100)
    assert(out.filter($"label".isNotNull).count() == 1)
  }

  test("approxCountDistinct lands within rsd of exact at fixture scale") {
    import spark.implicits._
    val df = spark.range(100000).select(($"id" % 5000).as("v"))
    val approx = df.agg(Scale.approxCountDistinct($"v", 0.02)).head.getLong(0)
    assert(math.abs(approx - 5000.0) / 5000.0 < 0.1)
  }

  test("approxQuantiles agrees with exact within the rank-error bound") {
    import spark.implicits._
    // Values 0..99999 once each: a value IS its rank, so the sketch's
    // rank-error guarantee (≤ n/accuracy) converts directly to a value
    // tolerance. accuracy=10000 over n=100000 → rank error ≤ 10.
    val n = 100000
    val accuracy = 10000
    val tol = n / accuracy + 1 // +1: exact percentile interpolates
    val ps = Seq(0.25, 0.5, 0.75)
    val df = spark.range(n).select($"id".cast("double").as("v"))
      .repartition(8) // sketch MERGE across partitions, not one pass
    val row = df.agg(
      percentile($"v", array(ps.map(lit): _*)).as("exact"),
      Scale.approxQuantiles($"v", ps, accuracy).as("approx")).head
    val exact = row.getSeq[Double](0)
    val approx = row.getSeq[Double](1)
    ps.indices.foreach { i =>
      assert(math.abs(exact(i) - approx(i)) <= tol,
        s"p=${ps(i)}: exact=${exact(i)} approx=${approx(i)}")
    }
    // grouped shape (the q49 call pattern): per-group bounds hold too
    val g = spark.range(n)
      .select(($"id" % 4).as("lang"), $"id".cast("double").as("v"))
      .groupBy($"lang")
      .agg(percentile($"v", array(lit(0.5))).as("exact"),
        Scale.approxQuantiles($"v", Seq(0.5), accuracy).as("approx"))
      .collect()
    assert(g.length == 4)
    g.foreach { r =>
      // per-group n = 25000 → rank error ≤ 2.5 ranks ≡ 10 in value
      // (group members stride by 4); allow interpolation slack
      assert(math.abs(r.getSeq[Double](1).head - r.getSeq[Double](2).head)
        <= 4.0 * tol, r.toString)
    }
  }
}
