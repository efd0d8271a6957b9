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

  test("triangles: K4 has four triangles, three per corner") {
    val e = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b))
    val got = Graph.triangles(e.toDF("s", "t"), "s", "t").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.size == 4)
    (1L to 4L).foreach { n =>
      assert(got(n).getAs[Long]("deg") == 3L)
      assert(got(n).getAs[Long]("tri") == 3L)
      assert(got(n).getAs[Long]("max_wedges") == 3L)
    }
  }

  test("triangles: squares and stars are triangle-free") {
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val star = Seq((9L, 10L), (9L, 11L), (9L, 12L), (9L, 13L))
    val got = Graph.triangles((square ++ star).toDF("s", "t"), "s", "t")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("tri")).toMap
    assert(got.values.forall(_ == 0L))
    assert(got.size == 9)
  }

  test("triangles: parallel, reversed, and self-loop edges collapse") {
    val e = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L)) // one triangle; duplicates/reverses/self-loop are noise
    val got = Graph.triangles(e.toDF("s", "t"), "s", "t").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.size == 3)
    got.values.foreach { r =>
      assert(r.getAs[Long]("deg") == 2L && r.getAs[Long]("tri") == 1L)
    }
  }

  test("triangles: matches brute force on a seeded random graph") {
    val rnd = new scala.util.Random(7)
    val n = 24
    val e = (for { a <- 1 to n; b <- 1 to n if a < b && rnd.nextDouble() < 0.3 }
      yield (a.toLong, b.toLong)).toVector
    val es = e.toSet
    def adj(x: Long, y: Long) = es.contains((math.min(x, y), math.max(x, y)))
    val bruteTri = (for {
      x <- 1 to n; y <- x + 1 to n; z <- y + 1 to n
      if adj(x, y) && adj(x, z) && adj(y, z)
    } yield (x.toLong, y.toLong, z.toLong)).toVector
    val perCorner = bruteTri.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val degTruth = e.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Graph.triangles(e.toDF("s", "t"), "s", "t").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == degTruth.keySet)
    got.foreach { case (node, r) =>
      assert(r.getAs[Long]("deg") == degTruth(node))
      assert(r.getAs[Long]("tri") == perCorner.getOrElse(node, 0L),
        s"node $node")
    }
    assert(got.values.map(_.getAs[Long]("tri")).sum == 3L * bruteTri.size)
  }

  test("bfsHops: exact layered distances on a path + branch graph") {
    // 1-2-3-4-5 path, plus branch 3-6; seeds {1}
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 6L))
    val seeds = Seq(1L).toDF("node")
    val got = Graph.bfsHops(es.toDF("s", "t"), "s", "t", seeds, "node", maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // hops: 1→0, 2→1, 3→2, 4→3, 6→3; 5 is 4 hops away → absent
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 6L -> 3))
  }

  test("bfsHops: edges are undirected and min-distance wins over a longer route") {
    // cycle 1-2-3-4-1: node 3 reachable in 2 via either side, never 3
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val got = Graph.bfsHops(es.toDF("s", "t"), "s", "t",
        Seq(1L).toDF("node"), "node", maxHops = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2))
  }

  test("bfsHops: isolated seeds report hops 0; early exit on empty frontier") {
    val es = Seq((1L, 2L))
    // seed 99 touches no edge; maxHops far beyond the graph diameter
    val got = Graph.bfsHops(es.toDF("s", "t"), "s", "t",
        Seq(1L, 99L).toDF("node"), "node", maxHops = 100)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 99L -> 0, 2L -> 1))
  }

  test("pageRankWeighted == pageRank on the expanded parallel-edge multiset") {
    // weights 1..4 over an asymmetric 4-node graph with a dangling-in
    // node; the grouped weighted run must equal, rank for rank and
    // degree for degree, the unweighted run on w-times-repeated edges
    val grouped = Seq((1L, 2L, 3L), (2L, 3L, 1L), (3L, 1L, 4L),
      (1L, 4L, 2L), (4L, 2L, 1L))
    val expanded = grouped.flatMap { case (s, d, w) =>
      Seq.fill(w.toInt)((s, d))
    }
    val viaW = Graph.pageRankWeighted(grouped.toDF("s", "t", "w"),
        "s", "t", "w", iters = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val viaExpand = Graph.pageRank(expanded.toDF("s", "t"), "s", "t", iters = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaW == viaExpand)
  }
}
