package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.ProductQuant

/** Measures the q52 scale claim on a synthetic corpus: per-query
  * wall-clock of the exact brute-force cosine top-k scan vs the PQ
  * ADC scan (8 one-byte codes + table lookup per vector, fixed-point
  * sum, 50-candidate exact re-rank), with codes/norms pre-built the
  * way a deployment stores them at index time. Also reports one-time
  * train+encode cost and the scan-payload ratio (m bytes vs 4·d).
  * Usage: `runMain graft.tools.ProbePq [N] [queries]` (default
  * 200000, 5). Prints one JSON line per corpus size. */
object ProbePq {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val nQueries = args.lift(1).map(_.toInt).getOrElse(5)
    val (m, subdim, c, k, shortlist) = (8, 8, 16, 10, 50)
    val dim = m * subdim
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // Deterministic synthetic embeddings in [-1, 1): element d of
    // vector i from seeded xxhash64 — stable across runs, no RNG.
    val e = spark.range(n.toLong).select(
      $"id".as("vec_id"),
      array((0 until dim).map(d =>
        ((pmod(xxhash64($"id", lit(d)), lit(2000001L)).cast("double")
          / 1000000.0) - 1.0).cast("float")): _*).as("embedding"))
      .repartition(32)
      .localCheckpoint()

    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.expressions.FloatVectorDot.dot(a, b)
    def secs[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // Index-time: train on a 10k sample, encode everything, store
    // PACKED codes+norms in one row per vector — the deployment's
    // persisted artifact (vec_id, codes[8], nrm).
    val subs = ProductQuant.subVectors(e, m, subdim)
    val (indexArtifacts, encodeSec) = secs {
      val cb = ProductQuant.trainCodebooks(
        ProductQuant.subVectors(e.filter($"vec_id" < 10000), m, subdim),
        c, iters = 1)
      val packed = ProductQuant.packCodes(ProductQuant.encode(subs, cb))
        .join(e.select($"vec_id",
          sqrt(dot($"embedding", $"embedding")).as("nrm")), Seq("vec_id"))
        .localCheckpoint()
      (cb, packed)
    }
    val (cb, packed) = indexArtifacts

    // A search SERVICE holds the query vector and the codebook (m·c
    // centroids — index metadata, bounded by config) in memory; only
    // corpus-sized state stays distributed. Model that for both paths:
    // queries and codebook collected once, outside the timed region.
    val queryIds = (0 until nQueries)
      .map(i => ((i.toLong * 37 + 11) % n).toLong).distinct
    val queryEmb: Map[Long, Array[Float]] = e
      .filter($"vec_id".isin(queryIds: _*))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray).toMap
    val codebook: Map[(Int, Long), Array[Float]] = cb
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        r.getSeq[Float](2).toArray).toMap

    def brute(qid: Long): Long = {
      val q = queryEmb(qid).map(_.toDouble)
      val qnrm = math.sqrt(q.map(x => x * x).sum)
      e.filter($"vec_id" =!= qid)
        .select($"vec_id",
          (graft.expressions.FloatVectorDot.dotConst($"embedding", q) /
            (sqrt(dot($"embedding", $"embedding")) * qnrm)).as("cos"))
        .orderBy($"cos".desc, $"vec_id".asc).limit(k).count()
    }
    def adc(qid: Long): Long = {
      val q = queryEmb(qid).map(_.toDouble)
      val qnrm = math.sqrt(q.map(x => x * x).sum)
      // Per-query constant: the flattened m·c ADC table (128 doubles;
      // dropped empty clusters fill 0.0), computed from the in-memory
      // codebook — the Ann planes-as-literals precedent.
      val flat = (0 until m).flatMap { s =>
        (0 until c).map { ci =>
          codebook.get((s, ci.toLong)).fold(0.0)(cv =>
            (0 until subdim).map(d =>
              cv(d).toDouble * q(s * subdim + d)).sum)
        }
      }
      val cand = packed
        .filter($"vec_id" =!= qid)
        .select($"vec_id",
          (ProductQuant.adcScoreLit($"codes", flat, c) /
            ($"nrm" * qnrm)).as("a"))
        .orderBy($"a".desc, $"vec_id".asc).limit(shortlist)
      // exact-cosine re-rank — same score as brute() so the two timed
      // paths return the same answer (modulo shortlist recall)
      e.join(broadcast(cand.select($"vec_id")), Seq("vec_id"))
        .select($"vec_id",
          (graft.expressions.FloatVectorDot.dotConst($"embedding", q) /
            (sqrt(dot($"embedding", $"embedding")) * qnrm)).as("cos"))
        .orderBy($"cos".desc, $"vec_id".asc).limit(k).count()
    }

    brute(queryIds.head); adc(queryIds.head) // warm codegen/JIT
    val (_, bruteSec) = secs { queryIds.foreach(brute) }
    val (_, adcSec) = secs { queryIds.foreach(adc) }

    // The claim that actually matters at corpus scale is the SCAN
    // FOOTPRINT (what a query must read when the corpus exceeds
    // memory): measure both artifacts as real parquet bytes.
    def parquetBytes(df: DataFrame): Long = {
      val dir = java.nio.file.Files.createTempDirectory("pq-size")
      try {
        df.write.mode("overwrite").parquet(dir.toString)
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala
          .filter(p => p.toString.endsWith(".parquet"))
          .map(p => java.nio.file.Files.size(p)).sum
      } finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    val floatBytes = parquetBytes(e)
    val codeBytes = parquetBytes(packed)

    println(
      s"""{"n":$n,"queries":$nQueries,"encode_sec":$encodeSec,""" +
        s""""bruteforce_sec_per_q":${bruteSec / nQueries},""" +
        s""""adc_sec_per_q":${adcSec / nQueries},""" +
        s""""speedup":${bruteSec / adcSec},""" +
        s""""float_parquet_bytes":$floatBytes,""" +
        s""""codes_parquet_bytes":$codeBytes,""" +
        s""""parquet_scan_ratio":${floatBytes.toDouble / codeBytes},""" +
        s""""raw_bytes_ratio":${4.0 * dim / m}}""")
    spark.stop()
  }
}
