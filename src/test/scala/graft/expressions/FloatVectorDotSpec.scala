package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class FloatVectorDotSpec extends SparkSpecBase {

  private def interpretedDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("matches the interpreted zip_with/aggregate form bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(
      FloatVectorDot.dot($"a", $"b").as("native"),
      interpretedDot($"a", $"b").as("hof"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null inputs and empty arrays behave sanely") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1f, 2f)), Some(Array(3f, 4f))),
      (None, Some(Array(1f))),
      (Some(Array.empty[Float]), Some(Array.empty[Float])))
      .toDF("a", "b")
    val out = df.select(FloatVectorDot.dot($"a", $"b")).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 0.0)
  }

  test("dotConst matches the interpreted lit-weight fold bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val w = Seq.fill(64)(rnd.nextDouble() - 0.5)
    val rows = (1 to 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val out = rows.toDF("id", "emb").repartition(3)
      .select(FloatVectorDot.dotConst($"emb", w).as("native"),
        graft.ops.Ann.dotLitHof($"emb", w).as("hof"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r.toString)
    }
  }

  test("dotConst null semantics match zip_with padding") {
    import spark.implicits._
    val w = Seq(0.5, 0.25)
    val df = Seq(
      Some(Array(2f, 4f)),   // 1.0 + 1.0 = 2.0
      None,                  // null input → null
      Some(Array(1f)),       // length mismatch → null (zip_with pads)
      Some(Array(1f, 2f, 3f))) // longer → null too
      .toDF("emb")
    val out = df.select(FloatVectorDot.dotConst($"emb", w).as("d"),
      graft.ops.Ann.dotLitHof($"emb", w).as("h")).collect()
    assert(out(0).getDouble(0) == 2.0)
    (1 to 3).foreach { i =>
      assert(out(i).isNullAt(0), s"row $i kernel")
      assert(out(i).isNullAt(1), s"row $i hof")
    }
  }

  test("Ann.bucket runs inside whole-stage codegen (no HOF fallback)") {
    import spark.implicits._
    val df = spark.range(8)
      .select(array((0 until 64).map(d =>
        (($"id" + d) % 7 - 3).cast("float")): _*).as("embedding"))
      .select(graft.ops.Ann.bucket($"embedding").as("bucket"))
    assert(df.collect().forall(r => r.getLong(0) >= 0 && r.getLong(0) < 16))
    val plan = df.queryExecution.executedPlan.toString
    // The bucket projection must be codegen'd (starred) and free of
    // interpreted higher-order functions.
    assert(!plan.contains("aggregate(zip_with"), plan.take(2000))
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project .*"), plan.take(500))
  }

  test("participates in whole-stage codegen plans") {
    import spark.implicits._
    // non-foldable source (range) so the projection can't be
    // constant-folded into a LocalTableScan at plan time
    val df = spark.range(10)
      .select(
        array(($"id" + 1).cast("float"), ($"id" + 2).cast("float")).as("a"),
        array(($"id" + 3).cast("float"), ($"id" + 4).cast("float")).as("b"))
      .select(FloatVectorDot.dot($"a", $"b").as("d"))
    // id=0: a=[1,2] b=[3,4] → 3 + 8 = 11
    assert(df.head.getDouble(0) == 11.0)
    // `*(n)` prefixes mark operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[float_vector_dot.*"),
      plan)
  }
}
