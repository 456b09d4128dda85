package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Optimized-PQ rotation via eigenvalue allocation — the parametric
  * OPQ of Ge et al., "Optimized Product Quantization", CVPR 2013
  * (OPQ_p): rotate the space with the PCA eigenbasis, then PERMUTE
  * the principal directions across the m subspaces so each subspace
  * receives a balanced share of the variance (greedy min-log-product
  * allocation). Product quantization assumes subspaces carry
  * comparable, independent information; raw embedding dimensions
  * rarely do (variance concentrates along correlated directions that
  * straddle subspace boundaries), and the closed-form allocation
  * recovers most of iterative OPQ's gain for Gaussian-ish data.
  *
  * Scale shape: the covariance is one distributed pass producing a
  * d×d matrix (bounded by CONFIG, not data — the ADC-table argument),
  * via mllib's RowMatrix.computeCovariance; the d×d
  * eigendecomposition runs on the driver with breeze (64×64 here —
  * microseconds); the rotation itself is d codegen'd dot kernels per
  * row against LITERAL basis rows (the Ann hyperplanes-as-literals
  * convention), a pure map stage applied once at index time to the
  * corpus and once per query. An orthonormal rotation preserves dots
  * and norms, so cosine semantics are untouched — only the
  * quantizer's view of the space changes. Not oracle-gated: an
  * eigendecomposition is not expressible in the DuckDB oracle;
  * OpqRotationSpec pins orthonormality, allocation balance, and the
  * recall win over natural-order PQ.
  */
object OpqRotation {

  /** d×d covariance of the embedding column, one distributed pass
    * (mllib RowMatrix — the public Spark API for exactly this). */
  def covariance(e: DataFrame, embCol: String): Array[Array[Double]] = {
    import org.apache.spark.mllib.linalg.Vectors
    import org.apache.spark.mllib.linalg.distributed.RowMatrix
    val rows = e.select(col(embCol)).rdd.map { r =>
      Vectors.dense(r.getSeq[Float](0).map(_.toDouble).toArray)
    }
    val cov = new RowMatrix(rows).computeCovariance()
    Array.tabulate(cov.numRows, cov.numCols)((i, j) => cov(i, j))
  }

  /** Eigenvalue-allocated rotation rows: eigendecompose (breeze
    * eigSym), sort principal directions by descending eigenvalue,
    * greedily hand each to the subspace with the smallest running
    * Σ log λ that still has a free slot, and emit the permuted
    * eigenbasis as ROW vectors — y_i = rows(i)·x. Subspace b owns
    * rows [b·subdim, (b+1)·subdim). Zero/negative eigenvalues (rank
    * deficiency) contribute log(λ+ε) so the greedy stays total. */
  def allocationRotation(cov: Array[Array[Double]], m: Int,
      subdim: Int): Array[Array[Float]] = {
    val d = cov.length
    require(m * subdim == d, s"m*subdim must equal d=$d")
    val es = breeze.linalg.eigSym(
      new breeze.linalg.DenseMatrix(d, d, cov.flatten.toArray))
    // eigSym returns ascending eigenvalues; take descending order
    val order = (0 until d).sortBy(i => -es.eigenvalues(i))
    val logs = Array.fill(m)(0.0)
    val fill = Array.fill(m)(0)
    val rows = Array.ofDim[Array[Float]](d)
    for (idx <- order) {
      val b = (0 until m).filter(fill(_) < subdim)
        .minBy(b => (logs(b), b))
      rows(b * subdim + fill(b)) = Array.tabulate(d)(j =>
        es.eigenvectors(j, idx).toFloat)
      logs(b) += math.log(math.max(es.eigenvalues(idx), 1e-12))
      fill(b) += 1
    }
    rows
  }

  /** y = R·x as a column: d compiled dot kernels against literal
    * basis rows, emitted as array<float> so the PQ slicers consume it
    * exactly like a raw embedding. */
  def rotate(x: Column, r: Array[Array[Float]]): Column =
    array(r.map(row =>
      graft.expressions.FloatVectorDot.dot(x, typedLit(row.toSeq))
        .cast("float")): _*)
}
