package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(points: org.apache.spark.sql.DataFrame,
                    intervals: org.apache.spark.sql.DataFrame) =
    points.join(intervals,
      col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bandJoin equals the naive theta join, boundaries inclusive") {
    // values land on bucket edges on purpose: v = 0, 200, 400 with
    // bucket = 200 sit exactly on cell borders; lo/hi hit v exactly
    val points = Seq((1L, 0.0), (2L, 199.99), (3L, 200.0), (4L, 355.5),
      (5L, 400.0), (6L, -50.0), (7L, 1000.0)).toDF("pid", "v")
    val intervals = Seq((10L, 0.0, 0.0), (11L, 100.0, 200.0),
      (12L, 150.0, 450.0), (13L, -100.0, -1.0), (14L, 999.0, 2000.0),
      (15L, 500.0, 100.0) // lo > hi: matches nothing
    ).toDF("iid", "lo", "hi")
    for (w <- Seq(0.5, 7.0, 200.0, 10000.0)) {
      val got = RangeJoin.bandJoin(points, intervals, "v", "lo", "hi", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive(points, intervals), s"bucket width $w")
    }
  }

  test("bandJoin equals naive on seeded random data, no duplicate pairs") {
    val rnd = new scala.util.Random(7)
    val points = (1L to 400L).map(i => (i, rnd.nextDouble() * 1000 - 200)).toDF("pid", "v")
    val intervals = (1L to 120L).map { i =>
      val lo = rnd.nextDouble() * 900 - 200
      (i, lo, lo + rnd.nextDouble() * 80)
    }.toDF("iid", "lo", "hi")
    val rows = RangeJoin.bandJoin(points, intervals, "v", "lo", "hi", 50.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.distinct.length) // one cell per pair, no dedup needed
    assert(rows.toSet == naive(points, intervals))
  }

  test("bandJoin plans as an equality join, never a nested loop") {
    val points = (1L to 1000L).map(i => (i, i * 1.0)).toDF("pid", "v")
    val intervals = (1L to 500L).map(i => (i, i * 2.0, i * 2.0 + 30)).toDF("iid", "lo", "hi")
    val plan = RangeJoin.bandJoin(points, intervals, "v", "lo", "hi", 25.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"band join must be equality-keyed; plan was:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
  }
}
