package graft.operators

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

/** Property check of the closed form [[Sampling.systematicSample]] rests
  * on: cnt(x) = min(k, (2kx + W − 1) div 2W) counts exactly the midpoint
  * pick positions p_i = (2i+1)·W div 2k below x, so per-row
  * multiplicities cnt(cum+w) − cnt(cum) (a) match a brute-force walk of
  * every position, (b) sum to exactly k, and (c) never touch a
  * zero-weight row — for ANY weight multiset, ANY order, ANY k. Pure
  * integer math, no SparkSession, so hundreds of cases run instantly
  * (the MisraGriesPropertySpec discipline). */
class SystematicSamplePropertySpec extends AnyFunSuite {

  private def cnt(x: Long, k: Long, bigW: Long): Long =
    math.min(k, (2 * k * x + bigW - 1) / (2 * bigW))

  private def holds(weights: List[Long], k: Int): Boolean = {
    val pos = weights.filter(_ > 0)
    if (pos.isEmpty) return true
    val bigW = pos.sum
    // the overflow guard the operator enforces at runtime
    if (bigW > (Long.MaxValue - bigW) / (2L * k)) return true
    val positions = (0 until k).map(i => (2L * i + 1) * bigW / (2L * k))
    var cum = 0L
    var picked = 0L
    val ok = weights.forall { w =>
      if (w <= 0) true // excluded before the prefix sum — no cum advance
      else {
        val brute = positions.count(p => p >= cum && p < cum + w).toLong
        val closed = cnt(cum + w, k, bigW) - cnt(cum, k, bigW)
        cum += w
        picked += closed
        closed == brute
      }
    }
    ok && picked == k
  }

  test("multiplicities equal the brute-force positions and sum to k, always") {
    val gen = for {
      n <- Gen.choose(1, 60)
      ws <- Gen.listOfN(n, Gen.oneOf(
        Gen.choose(0L, 5L),                 // tie/zero-heavy small weights
        Gen.choose(1L, 1000000L),           // spread weights
        Gen.const(0L)))                     // explicit zero rows
      k <- Gen.choose(1, 200)
    } yield (ws, k)
    val prop = Prop.forAll(gen) { case (ws, k) => holds(ws, k) }
    val res = check(Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("degenerate shapes: one row takes all k; k larger than row count") {
    assert(holds(List(7L), 13))              // single row → all 13 picks
    assert(holds(List(1L, 1L, 1L), 50))      // k ≫ n, ties everywhere
    assert(holds(List(0L, 0L, 5L), 4))       // zeros never picked
    assert(holds(List(Long.MaxValue / 1000, 1L), 3)) // near the guard
  }
}
