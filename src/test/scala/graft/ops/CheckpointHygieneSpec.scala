package graft.ops

import graft.SparkSpecBase
import graft.queries.{DedupQueries, Relational, SimilarityQueries}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Bench-hygiene: the iterative checkpointed loops (connected
  * components, Lloyd k-means) must not leave per-round blocks in
  * executor storage after they return — a query's cost must not
  * depend on which dedup query ran before it. The contract: at most
  * the RESULT frame's blocks are retained, and Checkpoints.unpersist
  * on the consumed result releases those too.
  */
class CheckpointHygieneSpec extends SparkSpecBase {

  private def retained: Set[Int] = Checkpoints.retainedRddIds(spark)

  private val pairT = StructType(Seq(
    StructField("doc_a", LongType), StructField("doc_b", LongType)))

  test("unpersist drops only STORED RDD-scan leaves") {
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.storage.StorageLevel
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, 2L)), 1), pairT)
    val leaf = df.queryExecution.analyzed.collect {
      case l: LogicalRDD => l.rdd
    }.head
    // Never-persisted leaf: unpersist must be a no-op, not a surprise
    // drop on a recomputable scan.
    assert(leaf.getStorageLevel == StorageLevel.NONE)
    Checkpoints.unpersist(df)
    assert(df.count() == 1)
    // Stored leaf: the consumed-frame release drops it.
    leaf.persist(StorageLevel.MEMORY_ONLY)
    Checkpoints.unpersist(df)
    assert(leaf.getStorageLevel == StorageLevel.NONE)
  }

  test("connectedComponents retains only the final label frame") {
    val before = retained
    // 9-node chain → 8 label-propagation rounds; without the
    // per-round unpersist this retains edges + 9 label frames.
    val chain = (1L to 8L).map(i => Row(i, i + 1))
    val pairs = spark.createDataFrame(
      spark.sparkContext.parallelize(chain, 2), pairT)
    val cc = Dedup.connectedComponents(pairs)
    assert(cc.collect().length == 9)
    val during = retained -- before
    // Exactly the final round's checkpoint may remain — never the
    // superseded rounds or the edge list.
    assert(during.size <= 1,
      s"retained ${during.size} RDDs after connectedComponents: $during")
    Checkpoints.unpersist(cc)
    assert((retained -- before).isEmpty,
      "result frame blocks survived Checkpoints.unpersist")
  }

  test("kmeansCentroids retains only the last Lloyd round") {
    val before = retained
    import spark.implicits._
    val e = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(d => ((i % 4) * 8 + d).toFloat / 32f)))
      .toDF("vec_id", "embedding")
    val cents = SimilarityQueries.kmeansCentroids(e, 4, 3)
    assert(cents.collect().length == 4)
    val during = retained -- before
    assert(during.size <= 1,
      s"retained ${during.size} RDDs after 3 Lloyd rounds: $during")
    Checkpoints.unpersist(cents)
    assert((retained -- before).isEmpty)
  }

  test("consume: repeated dedupClusters calls leave storage flat") {
    val before = retained
    val chain = (1L to 6L).map(i => Row(i, i + 1))
    // Three back-to-back invocations through the consuming API — the
    // long-session library pattern that used to leak one result frame
    // per call when the caller forgot the manual unpersist.
    (1 to 3).foreach { round =>
      val pairs = spark.createDataFrame(
        spark.sparkContext.parallelize(chain, 2), pairT)
      val n = Checkpoints.consume(Dedup.connectedComponents(pairs))(
        _.collect().length)
      assert(n == 7, s"round $round")
      assert((retained -- before).isEmpty,
        s"round $round left blocks in storage")
    }
    // ...and the frame is freed even when the consumer THROWS.
    val pairs = spark.createDataFrame(
      spark.sparkContext.parallelize(chain, 2), pairT)
    intercept[RuntimeException] {
      Checkpoints.consume(Dedup.connectedComponents(pairs)) { df =>
        df.collect(); throw new RuntimeException("consumer boom")
      }
    }
    assert((retained -- before).isEmpty, "failed consumer leaked blocks")
  }

  test("q35 then q36: dedup leaves storage clean for the next query") {
    val dir = "/root/testdata/sf0.001"
    val before = retained
    val clusters = DedupQueries.dedupClusters(spark, dir)
    assert(clusters.collect().nonEmpty)
    val during = retained -- before
    assert(during.size <= 1,
      s"dedupClusters retained ${during.size} RDDs: $during")
    Checkpoints.unpersist(clusters)
    assert((retained -- before).isEmpty,
      "dedupClusters result blocks survived unpersist")
    // The session-state victim from the bench history: q36 must run
    // against clean storage no matter that q35 just ran.
    assert(Relational.blameRollup(spark, dir).collect().nonEmpty)
    assert((retained -- before).isEmpty)
  }
}
