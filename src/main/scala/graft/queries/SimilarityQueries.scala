package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Similarity search over the `embeddings` table (`Array[Float]`, 64-d).
  *
  * Brute-force cosine top-k is the correctness baseline: the query
  * vector is broadcast, the scan is embarrassingly parallel, and the
  * top-k is a TakeOrdered (no full sort, no shuffle of the fact table).
  * At 100 TB the same plan holds — broadcast the (small) query set,
  * scan the corpus once; the LSH-bucketed variant in Dedup/ANN cuts the
  * candidate set when the query side is itself large.
  *
  * All arithmetic is double-precision, accumulated in array order with
  * the same `dot / (sqrt(nx) * sqrt(ny))` shape DuckDB's
  * `list_cosine_similarity` uses, so the oracle comparison is exact.
  */
object SimilarityQueries {

  /** Σ aᵢ·bᵢ accumulated left-to-right in doubles. */
  private def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Brute-force cosine top-k neighbors of one query vector. */
  def knnBruteForce(spark: SparkSession, dir: String, queryId: Long = 0L,
      k: Int = 10): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val q = e.filter($"vec_id" === queryId)
      .select($"embedding".as("q_embedding"))
    e.filter($"vec_id" =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos_full", cosine($"embedding", $"q_embedding"))
      .orderBy($"cos_full".desc, $"vec_id".asc)
      .limit(k)
      .select($"vec_id", round($"cos_full", 4).as("cosine"))
  }

  val oracles: Map[String, String] = Map(
    "q19_knn_cosine" ->
      """WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        | ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) AS cosine
        |FROM embeddings e, q
        |WHERE e.vec_id <> 0
        |ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC,
        | e.vec_id ASC
        |LIMIT 10""".stripMargin,
  )
}
