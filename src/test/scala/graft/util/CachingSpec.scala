package graft.util

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.SparkSpec

class CachingSpec extends SparkSpec {
  import spark.implicits._

  /** Block until every listener-bus callback enqueued BEFORE this call
    * has been delivered (the still-cached assertions below are in the
    * direction a fixed sleep makes FLAKY on a loaded host — a late
    * onSuccess arriving after the sleep would release the cache the
    * test just asserted warm). The bus has no public waitUntilEmpty, so
    * this enqueues a sentinel lease, consumes it, and polls for its
    * release: event delivery is FIFO, so the sentinel's release proves
    * every earlier event reached every listener. */
  private def drainListenerBus(): Unit = {
    val sentinel = spark.range(1).toDF("s")
    Caching.leased(sentinel)(sentinel.select(col("s"))).count()
    val deadline = System.nanoTime() + 30e9.toLong
    while (sentinel.storageLevel != StorageLevel.NONE && System.nanoTime() < deadline)
      Thread.sleep(10)
    assert(sentinel.storageLevel == StorageLevel.NONE, "listener bus did not drain")
  }

  test("leased frames are cached for the consuming action, freed after it") {
    val inter = (1 to 100).toDF("n").select((col("n") * 2).as("m"))
    val out = Caching.leased(inter)(inter.groupBy().agg(sum("m").as("s")))
    assert(inter.storageLevel == StorageLevel.MEMORY_AND_DISK, "lease should persist")
    assert(out.head().getLong(0) == 10100L)
    // the one-shot listener fires on the listener bus (async) — poll
    val deadline = System.nanoTime() + 10e9.toLong
    while (inter.storageLevel != StorageLevel.NONE && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(inter.storageLevel == StorageLevel.NONE,
      "lease must release the cache after the consuming action")
  }

  test("an interleaved unrelated action does not release the lease") {
    val inter = (1 to 50).toDF("n").select((col("n") * 3).as("m"))
    val out = Caching.leased(inter)(inter.groupBy().agg(sum("m").as("s")))
    spark.range(10).count() // unrelated action — its plan holds no lease
    drainListenerBus()      // its callback is fully delivered, not just likely
    assert(inter.storageLevel == StorageLevel.MEMORY_AND_DISK,
      "an action that does not consume the lease must not release it")
    assert(out.head().getLong(0) == 3825L)
    val deadline = System.nanoTime() + 10e9.toLong
    while (inter.storageLevel != StorageLevel.NONE && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(inter.storageLevel == StorageLevel.NONE,
      "the consuming action must release the lease")
  }

  test("leased2 releases only after BOTH outputs are consumed") {
    val inter = (1 to 40).toDF("n").select((col("n") * 5).as("m"))
    val (a, b) = Caching.leased2(inter)(
      (inter.filter(col("m") <= 100), inter.filter(col("m") > 100)))
    assert(inter.storageLevel == StorageLevel.MEMORY_AND_DISK)
    assert(a.count() == 20)
    drainListenerBus() // a's callback is fully delivered, not just likely
    assert(inter.storageLevel == StorageLevel.MEMORY_AND_DISK,
      "consuming ONE output must keep the cache warm for the other")
    assert(b.count() == 20)
    val deadline = System.nanoTime() + 10e9.toLong
    while (inter.storageLevel != StorageLevel.NONE && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(inter.storageLevel == StorageLevel.NONE,
      "consuming the second output must release the lease")
  }

  test("leased2 releases on a single action containing both outputs") {
    val inter = (1 to 30).toDF("n").select((col("n") * 7).as("m"))
    val (a, b) = Caching.leased2(inter)(
      (inter.filter(col("m") % 2 === 0), inter.filter(col("m") % 2 =!= 0)))
    assert(a.unionByName(b).count() == 30)
    val deadline = System.nanoTime() + 10e9.toLong
    while (inter.storageLevel != StorageLevel.NONE && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(inter.storageLevel == StorageLevel.NONE,
      "one union action consumes both outputs and releases the lease")
  }

  test("a released lease still recomputes correctly on a later action") {
    val inter = (1 to 10).toDF("n").select((col("n") + 1).as("m"))
    val out = Caching.leased(inter)(inter.filter(col("m") > 5))
    assert(out.count() == 6)
    val deadline = System.nanoTime() + 10e9.toLong
    while (inter.storageLevel != StorageLevel.NONE && System.nanoTime() < deadline)
      Thread.sleep(50)
    // correctness never depended on the cache: same answer, recomputed
    assert(out.count() == 6)
  }
}
