package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ProductQuantSpec extends SparkSpecBase {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("subVectors slices into m contiguous subdim-wide pieces") {
    val e = vecs((7L, (1 to 8).map(_.toFloat)))
    val out = ProductQuant.subVectors(e, m = 2, subdim = 4)
      .orderBy($"sub_id").collect()
    assert(out.length == 2)
    assert(out(0).getInt(1) == 0 &&
      out(0).getSeq[Float](2) == Seq(1f, 2f, 3f, 4f))
    assert(out(1).getInt(1) == 1 &&
      out(1).getSeq[Float](2) == Seq(5f, 6f, 7f, 8f))
  }

  private def toyCorpus = {
    // Two tight clusters in 8-d: A near e1-direction, B near e5-direction,
    // small deterministic jitter so vectors are distinct.
    def a(i: Int) = Seq(10f, 1f + i * 0.01f, 0f, 0f, 0f, 0f, 0.1f * i, 0f)
    def b(i: Int) = Seq(0f, 0.1f * i, 0f, 0f, 10f, 1f + i * 0.01f, 0f, 0f)
    vecs((0L until 6L).map(i => i -> a(i.toInt)) ++
      (6L until 12L).map(i => i -> b(i.toInt - 6)): _*)
  }

  test("every vector gets one code per subspace, from the codebook") {
    val subs = ProductQuant.subVectors(toyCorpus, m = 2, subdim = 4)
    val cb = ProductQuant.trainCodebooks(subs, c = 4, iters = 1)
    val codes = Checkpoints.consume(ProductQuant.encode(subs, cb))(
      _.collect())
    assert(codes.length == 12 * 2)
    assert(codes.map(r => (r.getLong(0), r.getInt(1))).distinct.length == 24)
    val cents = codes.map(_.getLong(2)).toSet
    assert(cents.subsetOf((0L until 4L).toSet))
  }

  test("identical vectors encode to identical codes") {
    val e = vecs(
      (0L, Seq(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f)),
      (1L, Seq(8f, 7f, 6f, 5f, 4f, 3f, 2f, 1f)),
      (2L, Seq(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f)), // dup of 0
      (3L, Seq(2f, 2f, 2f, 2f, 9f, 9f, 9f, 9f)))
    val subs = ProductQuant.subVectors(e, m = 2, subdim = 4)
    val cb = ProductQuant.trainCodebooks(subs, c = 2, iters = 1)
    val codes = Checkpoints.consume(ProductQuant.encode(subs, cb))(
      _.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap)
    assert(codes((0L, 0)) == codes((2L, 0)))
    assert(codes((0L, 1)) == codes((2L, 1)))
  }

  test("ADC ranking separates clusters: same-cluster vectors score higher") {
    val e = toyCorpus
    val subs = ProductQuant.subVectors(e, m = 2, subdim = 4)
    val cb = ProductQuant.trainCodebooks(subs, c = 4, iters = 1)
    val codes = ProductQuant.encode(subs, cb)
    val q = e.filter($"vec_id" === 0L)
    val qsubs = ProductQuant.subVectors(q, m = 2, subdim = 4)
      .select($"sub_id", $"subvec".as("qsub"))
    val adc = ProductQuant.adcTable(cb, qsubs)
    val scored = codes.join(broadcast(adc), Seq("sub_id", "cent_id"))
      .groupBy($"vec_id").agg(sum($"pdot").as("adot"))
      .filter($"vec_id" =!= 0L)
      .orderBy($"adot".desc, $"vec_id".asc)
    val ranked = Checkpoints.consume(scored)(_.collect().map(_.getLong(0)))
    // query is in cluster A (ids 1-5); all of A must outrank all of B.
    assert(ranked.take(5).toSet == (1L to 5L).toSet,
      s"cluster A not ranked first: ${ranked.mkString(",")}")
  }

  test("packCodes orders each vector's codes by subspace") {
    val codes = Seq((1L, 1, 7L), (1L, 0, 3L), (2L, 0, 2L), (2L, 1, 5L))
      .toDF("vec_id", "sub_id", "cent_id")
    val packed = ProductQuant.packCodes(codes)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(packed(1L) == Seq(3L, 7L))
    assert(packed(2L) == Seq(2L, 5L))
  }

  test("compiled ADC lookup matches the HOF twin and the join-form score") {
    val e = toyCorpus
    val subs = ProductQuant.subVectors(e, m = 2, subdim = 4)
    val cb = ProductQuant.trainCodebooks(subs, c = 4, iters = 1)
    val codes = ProductQuant.encode(subs, cb)
    val q = e.filter($"vec_id" === 0L)
    val qsubs = ProductQuant.subVectors(q, m = 2, subdim = 4)
      .select($"sub_id", $"subvec".as("qsub"))
    val adc = ProductQuant.adcTable(cb, qsubs)
    // join-form per-vector sum (the q52 oracle-gated path)
    val joinForm = codes.join(broadcast(adc), Seq("sub_id", "cent_id"))
      .groupBy($"vec_id").agg(sum($"pdot").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // packed + literal-table forms (the deployment scan path)
    val tbl = adc.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val flat = (0 until 2).flatMap(s =>
      (0 until 4).map(ci => tbl.getOrElse((s, ci.toLong), 0.0)))
    val packed = ProductQuant.packCodes(codes)
    val kernel = packed
      .select($"vec_id", ProductQuant.adcScoreLit($"codes", flat, 4).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val hof = packed
      .select($"vec_id",
        ProductQuant.adcScoreLitHof($"codes", flat, 2, 4).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(kernel == hof)
    joinForm.foreach { case (id, s) =>
      assert(math.abs(kernel(id) - s) < 1e-9, s"vec $id: $s vs ${kernel(id)}")
    }
  }

  test("ADC kernel nulls on out-of-range or wrong-arity codes") {
    val flat = Seq(1.0, 2.0, 3.0, 4.0) // m=2, c=2
    val rows = Seq(
      (1L, Seq(0L, 1L)),   // valid: t[0] + t[2+1] = 1 + 4
      (2L, Seq(0L, 5L)),   // code out of range
      (3L, Seq(1L)))       // wrong arity
      .toDF("vec_id", "codes")
    val out = rows
      .select($"vec_id", ProductQuant.adcScoreLit($"codes", flat, 2).as("s"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L).contains(5.0))
    assert(out(2L).isEmpty)
    assert(out(3L).isEmpty)
    // the HOF twin agrees on the corrupt inputs too (its guard mirrors
    // the kernel's null contract — negative codes would otherwise hit
    // element_at's from-the-end indexing)
    val negRows = Seq((1L, Seq(0L, 1L)), (2L, Seq(-2L, 1L)),
      (4L, Seq(0L, 3L))).toDF("vec_id", "codes")
    val kernelOut = negRows.select($"vec_id",
      ProductQuant.adcScoreLit($"codes", flat, 2).as("s"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val hofOut = negRows.select($"vec_id",
      ProductQuant.adcScoreLitHof($"codes", flat, 2, 2).as("s"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(kernelOut == hofOut)
    assert(kernelOut(2L).isEmpty && kernelOut(4L).isEmpty)
  }

  test("repeated train/encode cycles leave executor storage flat") {
    val subs = ProductQuant.subVectors(toyCorpus, m = 2, subdim = 4)
    def run(): Unit = {
      val cb = ProductQuant.trainCodebooks(subs, c = 4, iters = 2)
      Checkpoints.consume(ProductQuant.encode(subs, cb))(_.count())
    }
    run()
    val before = Checkpoints.retainedRddIds(spark)
    run(); run()
    val after = Checkpoints.retainedRddIds(spark)
    assert(after.size <= before.size,
      s"retained RDDs grew: $before -> $after")
  }
}
