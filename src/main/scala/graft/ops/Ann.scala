package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor primitives over embedding columns
  * (`Array[Float]`): random-hyperplane LSH bucketing with
  * deterministically derived planes.
  *
  * The hyperplane weights are pure functions of (plane, dim) via md5 —
  * w(p,d) = uint32(md5("p|d")[0:8]) / 2^32 - 0.5 — so the DuckDB oracle
  * can re-derive the identical planes in SQL and the bucket assignment
  * is reproducible across engines, runs, and cluster sizes (no RNG
  * state to ship). Weights are materialized once driver-side and
  * embedded as literals, so per-row work is just dot products inside
  * whole-stage codegen.
  *
  * Scale path: bucketing is a per-row map (no shuffle); a search
  * shuffles only the (bucket,) groups it probes. Brute-force cosine
  * (SimilarityQueries) is the recall baseline; more planes → smaller
  * buckets → cheaper probes and lower recall.
  */
object Ann {

  /** uint32(md5(s"$p|$d")[0:8]) / 2^32 - 0.5, the engine-portable
    * deterministic plane weight. */
  def planeWeight(p: Int, d: Int): Double = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"$p|$d".getBytes(StandardCharsets.UTF_8))
      .take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0 - 0.5
  }

  def planes(numPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until numPlanes).map(p => (0 until dim).map(d => planeWeight(p, d)))

  /** Σ embᵢ·wᵢ accumulated left-to-right (same fold order as the
    * oracle's list_sum over list_transform) — the codegen'd
    * constant-weight kernel; [[dotLitHof]] is its interpreted twin,
    * bit-parity-pinned by FloatVectorDotSpec. */
  private def dotLit(emb: Column, w: Seq[Double]): Column =
    graft.expressions.FloatVectorDot.dotConst(emb, w)

  /** Interpreted-HOF reference form of [[dotLit]] (CodegenFallback —
    * kept only as the parity oracle, never in a query path). */
  private[graft] def dotLitHof(emb: Column, w: Seq[Double]): Column =
    aggregate(
      zip_with(emb, typedLit(w), (x, y) => x.cast("double") * y),
      lit(0.0), (acc, x) => acc + x)

  /** LSH bucket id: bit p set iff dot(plane_p, emb) > 0. */
  def bucket(emb: Column, numPlanes: Int = 4, dim: Int = 64): Column =
    planes(numPlanes, dim).zipWithIndex.map { case (w, p) =>
      when(dotLit(emb, w) > 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
}
