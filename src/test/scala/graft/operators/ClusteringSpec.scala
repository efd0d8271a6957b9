package graft.operators

import graft.SparkSpec

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("kmeans: total assignment, consistent sizes, stable cluster ids") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val r = Clustering.kmeans(emb, "vec_id", "embedding", k = 4, iters = 2)
      .collect()
    assert(r.length == n, "every vector gets exactly one assignment")
    val byCluster = r.groupBy(_.getAs[Int]("cluster"))
    assert(byCluster.keySet.subsetOf((0 until 4).toSet))
    byCluster.foreach { case (_, rows) =>
      assert(rows.forall(_.getAs[Long]("cluster_size") == rows.length),
        "cluster_size equals the actual member count")
    }
  }

  test("kmeans is deterministic across runs") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def run() = Clustering.kmeans(emb, "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cluster"))).toSet
    assert(run() == run())
  }

  test("kmeans separates an obviously clustered fixture") {
    // two tight blobs on opposite axes: ids 1-3 near +x, ids 11-13 near +y;
    // seeds = lowest 2 ids land one in each blob after 1 iteration
    def v(x: Double, y: Double) = Seq.tabulate(4)(i =>
      if (i == 0) x.toFloat else if (i == 1) y.toFloat else 0f)
    val df = Seq(
      1L -> v(1.00, 0.01), 2L -> v(0.99, 0.02), 11L -> v(0.01, 1.00),
      3L -> v(0.98, 0.00), 12L -> v(0.02, 0.99), 13L -> v(0.00, 0.98)
    ).toDF("vec_id", "embedding")
    val got = Clustering.kmeans(df, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster")).toMap
    assert(got(1L) == got(2L) && got(2L) == got(3L))
    assert(got(11L) == got(12L) && got(12L) == got(13L))
    assert(got(1L) != got(11L))
  }

  test("semDedup: dominance rule keeps the lowest id per near-dup group") {
    // blob A: three near-identical vectors (ids 5, 2, 9) -> keep only 2;
    // blob B: one lone vector (id 7) -> kept; k=2 separates the blobs
    def v(x: Double, y: Double) = Seq(x.toFloat, y.toFloat, 0f, 0f)
    val df = Seq(
      5L -> v(1.00, 0.00), 2L -> v(0.999, 0.001), 9L -> v(0.998, 0.002),
      7L -> v(0.00, 1.00)
    ).toDF("vec_id", "embedding")
    val got = Clustering.semDedup(df, "vec_id", "embedding",
        k = 2, iters = 2, threshold = 0.95)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("keep")).toMap
    assert(got == Map(2L -> true, 5L -> false, 9L -> false, 7L -> true))
  }

  test("kmeans integer arithmetic: one hand-replayed iteration") {
    // 1-D micro space: vectors 0.1, 0.2, 0.9 (micros 100000, 200000,
    // 900000); seeds = two lowest ids -> c0 = {0: 100000, 1: 200000}.
    // iter 1 assignment: 100000->0, 200000->1, 900000->1;
    // update: c0 = 100000, c1 = floor((200000+900000)/2 + 0.5) = 550000;
    // final assignment: 0.1,0.2 -> 0? dist(200000,100000)=1e10 vs
    // dist(200000,550000)=1.225e11 -> cluster 0; 0.9 -> cluster 1.
    val df = Seq(
      1L -> Seq(0.1f), 2L -> Seq(0.2f), 3L -> Seq(0.9f)
    ).toDF("vec_id", "embedding")
    val got = Clustering.kmeans(df, "vec_id", "embedding", k = 2, iters = 1)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster")).toMap
    assert(got == Map(1L -> 0, 2L -> 0, 3L -> 1))
  }

  test("kmeansCentroids: the persisted index reproduces kmeans's assignment") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = (1L to 60L).map(i => (i, Seq.fill(4)(rnd.nextDouble()).map(_.toFloat)))
      .toDF("vec_id", "embedding")
    val index = Clustering.kmeansCentroids(df, "vec_id", "embedding", k = 3, iters = 2)
    assert(index.columns.toSeq == Seq("cluster", "centroid"))
    val fromKmeans = Clustering.kmeans(df, "vec_id", "embedding", k = 3, iters = 2)
      .select("vec_id", "cluster")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // assigning with the STORED centroids lands every vector in the same
    // cluster kmeans reported — the index is a faithful artifact
    val viaIndex = graft.operators.Similarity
      .ivfTopKIndexed(df, df.limit(0), index, "vec_id", "embedding", k = 1)
    viaIndex.count() // exercises assignment path; empty queries -> 0 rows
    val cents = index.collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toArray).toSeq
    val assigned = Clustering.micro(df, "vec_id", "embedding")
      .select($"id", Clustering.assignExpr(cents).as("cluster"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(assigned == fromKmeans)
  }
}
