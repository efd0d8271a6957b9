package graft.util

/** Overlap INDEPENDENT eager pipelines from driver threads (guide §2.6:
  * Spark's scheduler happily runs several jobs at once inside one
  * application; actions are only sequential because driver code calls
  * them sequentially). The iterative operators in this repo — component
  * rounds, tokenizer training sweeps — are EAGER by design (per-round
  * localCheckpoint + convergence probes), so a query composing several
  * independent runs would otherwise serialize them, leaving most cores
  * idle during every round's scheduling gaps and stage tails. Running
  * the branches from a small thread pool lets one branch's tasks
  * back-fill the executors another branch's tail leaves idle.
  *
  * FIFO job scheduling (the default) gives exactly the wanted
  * back-fill behaviour; results are position-stable; the first failure
  * rethrows to the caller (remaining branches finish in the background
  * and their work is discarded — the per-query error contract of the
  * bench/verify harness is unchanged).
  */
object Par {
  /** Driver threads in flight at once: enough to fill stage tails, not so
    * many that concurrent jobs fight for executors (guide §2.6: "2-3 jobs
    * in flight is plenty"). Excess thunks queue FIFO on the pool — results
    * stay position-stable — so a wide caller cannot spawn an unbounded
    * thread-per-thunk fleet of eager job loops (r14 verdict hardening). */
  private val MaxPool = 4

  def run[A](thunks: Seq[() => A]): Seq[A] = {
    if (thunks.sizeIs <= 1) return thunks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(thunks.size, MaxPool))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(
        thunks.map(t => scala.concurrent.Future(t()))),
      scala.concurrent.duration.Duration.Inf)
    finally pool.shutdown()
  }
}
