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
}
