package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

/** Property check of the mathematical core the whole heavy-hitters tier
  * rests on: for ANY stream, ANY weights, ANY partitioning, ANY merge
  * order, and ANY k, the merged Misra-Gries summary retains every item
  * whose total weight exceeds W/(k+1) — the superset guarantee the
  * exact-recount second pass turns into exact output. Driven directly
  * against the aggregate's buffer ops (update/merge/serialize), no
  * SparkSession, so hundreds of random cases run in milliseconds. */
class MisraGriesPropertySpec extends AnyFunSuite {

  private def run(rows: List[(String, Long)], k: Int, nParts: Int,
                  seed: Long): Boolean = {
    val mg = MisraGries(
      BoundReference(0, StringType, nullable = true),
      BoundReference(1, LongType, nullable = true), k)
    val bufs = Array.fill(nParts)(mg.createAggregationBuffer())
    rows.zipWithIndex.foreach { case ((s, w), i) =>
      val row = new GenericInternalRow(
        Array[Any](UTF8String.fromString(s), w))
      mg.update(bufs(i % nParts), row): Unit
    }
    assert(bufs.forall(_.size() <= k), "buffer exceeded k counters")
    // merge in a seeded-random order, with serialize round-trips
    // interleaved (the shuffle-exchange path)
    val rnd = new scala.util.Random(seed)
    val merged = rnd.shuffle(bufs.toSeq)
      .map(b => if (rnd.nextBoolean()) mg.deserialize(mg.serialize(b)) else b)
      .reduce(mg.merge)
    assert(merged.size() <= k, "merged buffer exceeded k counters")
    val totals = rows.filter(_._2 > 0L)
      .groupMapReduce(_._1)(_._2)(_ + _)
    val bigW = totals.values.sum
    totals.forall { case (item, tw) =>
      tw * (k + 1) <= bigW || merged.containsKey(UTF8String.fromString(item))
    }
  }

  test("property: merged sketch retains every item above W/(k+1)") {
    val genRow = Gen.zip(
      Gen.chooseNum(0, 30).map(i => s"i$i"),
      // include zero/negative weights: they must be inert, not corrupting
      Gen.frequency(9 -> Gen.chooseNum(1L, 50L), 1 -> Gen.chooseNum(-5L, 0L)))
    val prop = Prop.forAllNoShrink(
      Gen.chooseNum(50, 400).flatMap(n => Gen.listOfN(n, genRow)),
      Gen.chooseNum(2, 12), Gen.chooseNum(1, 8), Gen.long) {
      (rows, k, nParts, seed) => run(rows, k, nParts, seed)
    }
    val res = check(Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: unit weights reproduce the classic count guarantee") {
    val genRow = Gen.chooseNum(0, 40).map(i => (s"t$i", 1L))
    val prop = Prop.forAllNoShrink(
      Gen.chooseNum(50, 500).flatMap(n => Gen.listOfN(n, genRow)),
      Gen.chooseNum(2, 10), Gen.chooseNum(1, 6), Gen.long) {
      (rows, k, nParts, seed) => run(rows, k, nParts, seed)
    }
    val res = check(Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }
}
