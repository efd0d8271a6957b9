package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // 4-node graph: 1→2, 1→3, 2→1, 3→1, 4→1 (node 4 has no in-edges)
  private val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L), (4L, 1L))

  private def replay(es: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val out = es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val in = es.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
    var r = nodes.map(_ -> 1000000L).toMap
    (1 to iters).foreach { _ =>
      r = nodes.map { n =>
        val s = in.getOrElse(n, Seq()).map(u => r(u) / out(u)).sum
        n -> (150000L + 85L * s / 100L)
      }.toMap
    }
    r
  }

  test("pageRank matches the exact integer recurrence") {
    val df = edges.toDF("s", "t")
    val got = Graph.pageRank(df, "s", "t", iters = 10).collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("pr_e6"), r.getAs[Long]("out_deg"), r.getAs[Long]("in_deg"))).toMap
    val want = replay(edges, 10)
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    got.foreach { case (n, (pr, _, _)) => assert(pr == want(n), s"node $n") }
    // node 4: no in-edges → rank settles at the teleport floor
    assert(got(4L)._1 == 150000L)
    assert(got(4L)._3 == 0L)
    // node 1 takes in-flow from three nodes → strictly highest
    assert(got(1L)._1 > got(2L)._1 && got(2L)._1 == got(3L)._1)
    // degrees
    assert(got(1L)._2 == 2L && got(1L)._3 == 3L)
  }

  test("checkpointEvery changes the plan, not the answer") {
    val df = edges.toDF("s", "t")
    val a = Graph.pageRank(df, "s", "t", iters = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Graph.pageRank(df, "s", "t", iters = 6, checkpointEvery = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("parallel edges count as multigraph edges") {
    // 1→2 twice: out_deg(1)=2, each contributes r/2
    val df = Seq((1L, 2L), (1L, 2L)).toDF("s", "t")
    val got = Graph.pageRank(df, "s", "t", iters = 1).collect()
      .map(r => r.getAs[Long]("node") -> r).toMap
    // r(2) = 150000 + 85 * (2 * (1000000 div 2)) div 100
    assert(got(2L).getAs[Long]("pr_e6") == 150000L + 85L * 1000000L / 100L)
    assert(got(2L).getAs[Long]("in_deg") == 2L)
    assert(got(1L).getAs[Long]("out_deg") == 2L)
  }
}
