package graft.ops

/** Driver-side fan-out for INDEPENDENT Spark actions (optimization
  * guide §2.6): Spark's scheduler happily runs several jobs at once
  * inside one application — actions are only sequential because the
  * driver calls them sequentially. Operators that must materialize
  * several independent artifacts (the q103 calibration card trains
  * four codebook families; the stored-index writers persist several
  * small artifacts) fan the actions out on a small thread pool so a
  * later job's tasks back-fill executors idled by an earlier job's
  * tail and the driver round-trips overlap. Each thunk must be
  * independent of the others (no shared mutable state, no ordering
  * assumption); determinism of each result is the thunk's own
  * property and is unaffected by concurrency. */
object Jobs {

  /** Run the thunks concurrently on up to `parallelism` driver
    * threads and return their results in input order; any failure
    * rethrows. Degenerate sizes run inline. */
  def par[T](thunks: Seq[() => T], parallelism: Int = 6): Seq[T] =
    if (thunks.lengthCompare(1) <= 0) thunks.map(_())
    else {
      val pool = java.util.concurrent.Executors
        .newFixedThreadPool(math.min(parallelism, thunks.size))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(
          thunks.map(t => scala.concurrent.Future(t()))),
        scala.concurrent.duration.Duration.Inf)
      finally pool.shutdown()
    }

  /** Two-result convenience over [[par]]. */
  def par2[A, B](a: () => A, b: () => B): (A, B) = {
    val rs = par(Seq(() => a(): Any, () => b(): Any))
    (rs(0).asInstanceOf[A], rs(1).asInstanceOf[B])
  }
}
