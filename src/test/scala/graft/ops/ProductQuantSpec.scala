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
