package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  test("stableBucket is deterministic and stable under corpus growth") {
    val small = (0L until 100L).toDF("id")
      .select($"id", Sampling.stableBucket($"id", "s", 10).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val grown = (0L until 1000L).toDF("id")
      .select($"id", Sampling.stableBucket($"id", "s", 10).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every id keeps its bucket when the corpus grows 10x
    assert(small.forall { case (id, b) => grown(id) == b })
  }

  test("buckets are in range and roughly uniform") {
    val counts = (0L until 10000L).toDF("id")
      .select(Sampling.stableBucket($"id", "s", 10).as("b"))
      .groupBy($"b").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf((0L until 10L).toSet))
    // md5 is uniform: each decile of 10k ids within ±20% of 1000
    counts.values.foreach(c => assert(c > 800 && c < 1200, counts))
  }

  test("different salts give independent assignments") {
    val joined = (0L until 1000L).toDF("id")
      .select($"id",
        Sampling.stableBucket($"id", "a", 2).as("ba"),
        Sampling.stableBucket($"id", "b", 2).as("bb"))
      .groupBy($"ba", $"bb").count().collect()
    // all four (ba, bb) cells populated — assignments not correlated
    assert(joined.length == 4)
  }

  test("assignSplit is disjoint, complete, and honors the cuts") {
    val splits = (0L until 10000L).toDF("id")
      .select(Sampling.assignSplit($"id", "split",
        Seq("train" -> 90, "val" -> 95), "test").as("s"))
      .groupBy($"s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet == Set("train", "val", "test"))
    assert(splits.values.sum == 10000L)
    assert(splits("train") > 8700 && splits("train") < 9300, splits)
    assert(splits("val") > 350 && splits("val") < 650, splits)
    assert(splits("test") > 350 && splits("test") < 650, splits)
  }

  test("non-increasing, zero, or >100 cuts are rejected") {
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(lit(1L), "s", Seq("a" -> 95, "b" -> 90), "c")
    }
    // equal cuts would silently produce an empty split
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(lit(1L), "s", Seq("a" -> 90, "b" -> 90), "c")
    }
    // a cut above 100 would make the remainder unreachable
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(lit(1L), "s", Seq("a" -> 90, "b" -> 101), "c")
    }
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(lit(1L), "s", Seq("a" -> 0), "c")
    }
  }
}
