package graft.util

import org.scalatest.funsuite.AnyFunSuite

class ParSpec extends AnyFunSuite {

  test("run: results are position-stable") {
    val out = Par.run((1 to 10).map(i => () => i * i))
    assert(out == (1 to 10).map(i => i * i))
  }

  test("run: pool is capped — a wide fan-out never runs unbounded threads") {
    val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    val peak = new java.util.concurrent.atomic.AtomicInteger(0)
    val thunks = (1 to 32).map { i => () =>
      val cur = inFlight.incrementAndGet()
      peak.updateAndGet(p => math.max(p, cur))
      Thread.sleep(20)
      inFlight.decrementAndGet()
      i
    }
    val out = Par.run(thunks)
    assert(out == (1 to 32))
    assert(peak.get() <= 4, s"peak concurrency ${peak.get()} exceeds the pool cap")
  }

  test("run: first failure rethrows") {
    val e = intercept[RuntimeException] {
      Par.run(Seq(() => 1, () => throw new RuntimeException("boom"), () => 3))
    }
    assert(e.getMessage == "boom")
  }
}
