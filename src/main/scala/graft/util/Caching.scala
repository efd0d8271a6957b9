package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.storage.StorageLevel

/** Leased persist for operator-internal intermediates.
  *
  * The dedup/similarity operators cache small derived frames (shingle
  * sets, banded signatures) that feed several branches of ONE returned
  * plan. A bare `.persist` with no matching unpersist accumulates
  * block-manager storage for the lifetime of the session — across a
  * 60-query Verify/Bench run, or any long-lived production session, that
  * is a leak.
  *
  * `leased` persists the intermediates and registers a one-shot
  * [[QueryExecutionListener]] that unpersists them (non-blocking) as soon
  * as the session completes its next action — which, for an operator whose
  * result is consumed by exactly one write/collect, is precisely the
  * consuming action. If a later action re-executes the plan (e.g. a bench
  * re-run calls the operator again), the operator re-leases fresh caches,
  * so correctness never depends on the lease: at worst a branch recomputes.
  */
object Caching {
  def leased(frames: DataFrame*)(result: => DataFrame): DataFrame = {
    frames.foreach(_.persist(StorageLevel.MEMORY_AND_DISK))
    val out = result
    val lm = out.sparkSession.listenerManager
    val listener = new QueryExecutionListener {
      private val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      private def cleanup(): Unit = if (done.compareAndSet(false, true)) {
        frames.foreach(_.unpersist(blocking = false))
        lm.unregister(this)
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = cleanup()
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = cleanup()
    }
    lm.register(listener)
    out
  }
}
