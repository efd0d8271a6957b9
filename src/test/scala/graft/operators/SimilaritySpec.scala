package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosineTopK ranks by exact cosine with deterministic ties") {
    val vecs = Seq(
      (0L, Seq(1f, 0f)),             // query
      (1L, Seq(2f, 0f)),             // cosine 1.0
      (2L, Seq(1f, 1f)),             // cosine √2/2
      (3L, Seq(0f, 1f)),             // cosine 0
      (4L, Seq(-1f, 0f))             // cosine -1
    ).toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(vecs, vecs.filter(col("vec_id") === 0),
        "vec_id", "embedding", 3)
      .orderBy("rnk").collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(top.toSeq == Seq((1, 1L, 1.0), (2, 2L, 0.707107), (3, 3L, 0.0)))
  }

  test("annTopK: same-bucket neighbors are exact-ranked; recall is useful") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
    val exact = Similarity.cosineTopK(e, q, "vec_id", "embedding", 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annTopK(e, q, "vec_id", "embedding", 5, nPlanes = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.3, s"ANN recall $recall collapsed — bucketing broken?")
    // every ANN hit must be a real corpus pair with correct per-bucket rank:
    assert(ann.forall { case (q1, n1) => q1 < 20 && n1 != q1 })
  }

  test("ivfTopK: k-means cells with multi-probe give useful recall") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
    val exact = Similarity.cosineTopK(e, q, "vec_id", "embedding", 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(e, q, "vec_id", "embedding", 5, nLists = 16, nProbe = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall $recall collapsed")
  }

  private def collectPairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("cosinePairsBlocked equals the exact all-pairs answer on the fixture") {
    // completeness is structural (every pair meets in exactly one grid
    // cell), so this holds at ANY threshold — including 0.45, where LSH
    // pruning mathematically can't work
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = collectPairs(Similarity.cosinePairs(e, "vec_id", "embedding", 0.45))
    val blocked = collectPairs(Similarity.cosinePairsBlocked(e, "vec_id", "embedding", 0.45))
    assert(exact.nonEmpty, "fixture should contain qualifying pairs")
    assert(blocked == exact,
      s"blocked missed ${(exact -- blocked).size}, extra ${(blocked -- exact).size}")
    // also with blocks > distinct ids' spread and blocks = 1 (degenerate)
    assert(collectPairs(Similarity.cosinePairsBlocked(e, "vec_id", "embedding", 0.45, blocks = 1)) == exact)
  }

  test("cosinePairsLsh equals exact on a planted high-threshold corpus") {
    // LSH's regime: near-dup pairs at cosine >= 0.9 (theta ~ 26°). The
    // default 64x12 bands give per-pair miss ~ 2e-5 — deterministic
    // planes make the outcome a fixed fact for this seeded corpus.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def unit(): Array[Double] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val base = (0 until 200).map(i => (i.toLong, unit()))
    // plant 20 near-dups: id 1000+i is a small perturbation of base i
    val dups = (0 until 20).map { i =>
      val b = base(i)._2
      val p = b.zip(Array.fill(64)(rnd.nextGaussian() * 0.04)).map { case (x, e) => x + e }
      val n = math.sqrt(p.map(x => x * x).sum)
      (1000L + i, p.map(_ / n))
    }
    val df = (base ++ dups).toDF("vec_id", "embedding")
    val exact = collectPairs(Similarity.cosinePairs(df, "vec_id", "embedding", 0.9))
    val lsh = collectPairs(Similarity.cosinePairsLsh(df, "vec_id", "embedding", 0.9))
    assert(exact.size >= 15, s"fixture should plant enough >=0.9 pairs, got ${exact.size}")
    assert(lsh == exact, s"LSH missed ${(exact -- lsh).size}, extra ${(lsh -- exact).size}")
  }

  test("ivfTopK trains on a bounded sample, not the corpus") {
    // the training read must carry a GlobalLimit of nLists*256 — the
    // full-corpus fit was the 100 TB scale-killer (r3 verdict #3)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val out = Similarity.ivfTopK(e, q, "vec_id", "embedding", 3, nLists = 4, nProbe = 2)
    assert(out.count() == 15, "3 neighbors per query for 5 queries")
  }

  test("quantizeInt8: values in [-127,127], max component hits ±127, dequant error bounded") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = Similarity.quantizeInt8(e, "vec_id", "embedding").collect()
    val orig = e.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble)).toMap
    assert(q.nonEmpty)
    q.foreach { r =>
      val id = r.getLong(0)
      val scale = r.getLong(1) / 1e6
      val qs = r.getSeq[Int](2)
      assert(qs.forall(v => v >= -127 && v <= 127))
      assert(qs.exists(v => math.abs(v) == 127), s"vec $id: max component must map to ±127")
      // dequantization error ≤ half a quantization step (+ scale_e6 round-off)
      val err = orig(id).zip(qs).map { case (x, v) => math.abs(x - v * scale / 127) }.max
      assert(err <= scale / 254 + 1e-6, s"vec $id err $err > step/2")
    }
  }

  test("centroidInt8: exact integer means per component, pos-ordered csv") {
    import spark.implicits._
    // label 1: q-vectors (127, 0) and (0, 127) → centroid (63.5, 63.5)
    // label 2: one vector scaling to (127, -127)
    val df = Seq(
      (1, Array(1.0f, 0.0f)), (1, Array(0.0f, 1.0f)),
      (2, Array(0.5f, -0.5f))
    ).toDF("label", "embedding")
    val r = Similarity.centroidInt8(df, "label", "embedding").collect()
      .map(x => x.getInt(0) -> ((x.getLong(1), x.getString(2)))).toMap
    assert(r(1) == ((2L, "63500000,63500000")))
    assert(r(2) == ((1L, "127000000,-127000000")))
  }

  test("knnGraphCapped/mutualKnnCapped: below-cap output identical to uncapped; over-cap cells report, never pair") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // plant one oversized cell: 150 members vs cap 100; natural
    // sf0.001 cells are ~50 and pass
    val planted = (1 to 150).map(i =>
      (-i.toLong, Array.fill(64)(0.5f), -1)).toDF("vec_id", "embedding", "label")
    val corpus = e.unionByName(planted)
    val (edges, capped) = Similarity.knnGraphCapped(
      corpus, "vec_id", "embedding", "label", 3, maxCell = 100)
    def edgeRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    // BELOW-CAP EQUALITY: the capped graph over passing cells is
    // byte-identical to the uncapped graph on the same cells
    assert(edgeRows(edges) ==
      edgeRows(Similarity.knnGraph(e, "vec_id", "embedding", "label", 3)))
    // the oversized cell never pair-joins: every member reported once,
    // with exact accounting
    val rep = capped.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rep.length == 150)
    assert(rep.forall { case (cell, size, id) => cell == -1 && size == 150L && id < 0 })
    assert(edges.filter(col("src") < 0 || col("nid") < 0).isEmpty)
    // the mutual twin inherits both halves
    val (mp, mc) = Similarity.mutualKnnCapped(
      corpus, "vec_id", "embedding", "label", 3, maxCell = 100)
    def pairRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairRows(mp) ==
      pairRows(Similarity.mutualKnn(e, "vec_id", "embedding", "label", 3)))
    assert(mc.count() == 150)
    // guard rails
    intercept[IllegalArgumentException](
      Similarity.knnGraphCapped(corpus, "vec_id", "embedding", "label", 3, 1))
  }

  test("knnGraphCapped: null cluster keys never surface as a capped cell (knnGraph parity)") {
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("label", col("label").cast("string"))
    // more null-cluster rows than the cap: knnGraph's equi-join never
    // pairs them, so the capped twin must not report them as a cell
    val nulls = (1 to 120).map(i =>
      (-i.toLong, Array.fill(64)(0.5f), null: String)).toDF("vec_id", "embedding", "label")
    val corpus = e.unionByName(nulls)
    val (edges, capped) = Similarity.knnGraphCapped(
      corpus, "vec_id", "embedding", "label", 3, maxCell = 100)
    assert(capped.isEmpty,
      s"null cluster keys must not report as a capped cell: ${capped.collect().toSeq}")
    assert(edges.filter(col("src") < 0 || col("nid") < 0).isEmpty,
      "null-cluster rows must never pair")
    // parity: identical edge set to uncapped knnGraph on the same corpus
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows(edges) ==
      rows(Similarity.knnGraph(corpus, "vec_id", "embedding", "label", 3)))
  }

  test("semanticDedup: first occurrence wins inside a cluster, blind across") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), 0),      // kept: first in cluster 0
      (2L, Seq(1.0f, 0.001f), 0),    // dropped: ~parallel to 1 in-cluster
      (3L, Seq(0.0f, 1.0f), 0),      // kept: orthogonal to both
      (4L, Seq(1.0f, 0.0f), 1),      // kept: identical to 1 but OTHER cluster
      (5L, Seq(1.0f, 0.0005f), 0)    // dropped by BOTH 1 and 2
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.semanticDedup(df, "vec_id", "embedding", "label", 0.9)
      .collect().map(x => x.getLong(0) -> ((x.getLong(2), x.getBoolean(3)))).toMap
    assert(r == Map(
      1L -> ((0L, true)), 2L -> ((1L, false)), 3L -> ((0L, true)),
      4L -> ((0L, true)), 5L -> ((2L, false))))
  }

  test("semanticDedup matches brute-force within-label verdicts on the fixture") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val verdicts = Similarity.semanticDedup(e, "vec_id", "embedding", "label", 0.45)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    val byId = e.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0d; var na = 0d; var nb = 0d
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    assert(verdicts.size == byId.length)
    byId.foreach { case (id, v, lab) =>
      val n = byId.count { case (id2, v2, lab2) =>
        lab2 == lab && id2 < id && cos(v2, v) >= 0.45
      }
      assert(verdicts(id) == ((n.toLong, n == 0)), s"verdict drift for $id")
    }
  }

  test("srpSketch equals an independently-computed integer projection") {
    val vecs = Seq(
      (1L, Seq(0.5f, -0.25f, 0.125f)),
      (2L, Seq(0.5f, -0.25f, 0.125f)),   // identical vector → identical sketch
      (3L, Seq(-1f, 2f, -3f)),
      (4L, Seq(0f, 0f, 0f))              // zero vector → all-zero sketch
    ).toDF("vec_id", "embedding")
    val got = Similarity.srpSketch(vecs, "vec_id", "embedding",
        outDim = 4, salt = "t1")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // truth: same md5-parity matrix and micro-int dot, computed from scratch
    def sign(i: Int, j: Int): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$j:t1".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xF) % 2 == 0) 1L else -1L
    }
    def truth(v: Seq[Float]): String = (0 until 4).map { i =>
      v.zipWithIndex.map { case (x, j) =>
        math.floor(x.toDouble * 1e6 + 0.5).toLong * sign(i, j)
      }.sum
    }.mkString(",")
    assert(got(1L) == truth(Seq(0.5f, -0.25f, 0.125f)))
    assert(got(2L) == got(1L))
    assert(got(3L) == truth(Seq(-1f, 2f, -3f)))
    assert(got(4L) == "0,0,0,0")
    // the matrix is genuinely mixed: not all signs equal across components
    assert(got(3L).split(",").map(_.toLong).distinct.length > 1)
  }

  test("pq: codes are deterministic, in range, and ADC recall is useful") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val model = Similarity.pqTrain(e, "vec_id", "embedding", m = 8, k = 16)
    assert(model.codebooks.size == 8 && model.subDim == 8)
    assert(model.codebooks.forall(cb => cb.nonEmpty && cb.forall(_.size == 8)))
    // deterministic: training twice gives the same codebooks
    val model2 = Similarity.pqTrain(e, "vec_id", "embedding", m = 8, k = 16)
    assert(model == model2)
    val enc = Similarity.pqEncode(e, "vec_id", "embedding", model)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(enc.size == 500)
    assert(enc.values.forall { case (csv, mse) =>
      val codes = csv.split(",").map(_.toInt)
      codes.length == 8 && codes.forall(c => c >= 0 && c < 16) && mse >= 0
    })
    // ADC ranking approximates the exact L2 ranking
    val q = e.filter(col("vec_id") < 10)
    val adc = Similarity.pqTopK(e, q, "vec_id", "embedding", kNN = 10, model)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val vecs = e.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = vecs.keys.filter(_ < 10).flatMap { qid =>
      vecs.keys.filter(_ != qid).toSeq
        .sortBy(n => (l2(vecs(qid), vecs(n)), n)).take(10).map(qid -> _)
    }.toSet
    val recall = (adc & exact).size.toDouble / exact.size
    // collapse detector, not a quality SLA: random top-10 over 499
    // candidates recalls ~0.02; any trained codebook lands ~0.25-0.35
    // on this fixture (m=8, k=16 over 64 dims — solution-to-solution
    // noise between equal-SSE fits moves it a few pairs either way)
    assert(recall >= 0.25, s"PQ ADC recall $recall collapsed")
  }

  test("annTopK scores matcher: bucket-mates score identically to exact") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val exactScores = Similarity.cosineTopK(e, q, "vec_id", "embedding", 400)
      .select("qid", "nid", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ann = Similarity.annTopK(e, q, "vec_id", "embedding", 5, nPlanes = 4)
      .select("qid", "nid", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    ann.foreach { case (k, c) =>
      assert(exactScores.get(k).forall(_ == c), s"score drift for $k")
    }
  }

  test("rrfFuse: micro-integer contributions, single-list docs, tie-break") {
    import spark.implicits._
    // floor(1e6/61 + 0.5) = 16393, floor(1e6/62 + 0.5) = 16129
    val lex = Seq(("q1", "a", 1), ("q1", "b", 2),
                  ("q2", "x", 1), ("q2", "y", 2)).toDF("q", "id", "rnk")
    val sem = Seq(("q1", "b", 1), ("q1", "c", 2),
                  ("q2", "y", 1), ("q2", "x", 2)).toDF("q", "id", "rnk")
    val r = Similarity.rrfFuse(Seq(lex, sem), "q", "id", "rnk", k = 2)
      .collect()
      .map(x => (x.getString(0), x.getAs[Int]("rnk")) ->
        ((x.getString(1), x.getAs[Long]("rrf_e6"), x.getAs[Long]("n_lists"))))
      .toMap
    assert(r(("q1", 1)) == (("b", 32522L, 2L))) // both lists
    assert(r(("q1", 2)) == (("a", 16393L, 1L))) // lex only; c (16129) cut at k=2
    // q2: x and y tie at 32522 -> doc-id tie-break, x first
    assert(r(("q2", 1)) == (("x", 32522L, 2L)))
    assert(r(("q2", 2)) == (("y", 32522L, 2L)))
    assert(r.size == 4)
  }

  test("rrfFuse of a single list preserves its rank order") {
    import spark.implicits._
    val lst = Seq(("q", "a", 1), ("q", "b", 2), ("q", "c", 3)).toDF("q", "id", "rnk")
    val r = Similarity.rrfFuse(Seq(lst), "q", "id", "rnk", k = 3)
      .orderBy("rnk").collect().map(_.getString(1)).toSeq
    assert(r == Seq("a", "b", "c")) // 1/(c+rank) is monotone decreasing
  }

  test("embedAudit: every failure mode gets the right verdict, clean rows keep") {
    import spark.implicits._
    val dims = 4
    def full(xs: Float*): Option[Seq[Option[Float]]] = Some(xs.map(Some(_)))
    val rows = Seq(
      (1L, full(1f, 0f, 0f, 0f)),                    // clean unit vector
      (2L, full(0.5f, 0.5f, 0.5f, 0.5f)),            // clean unit vector
      (3L, full(Float.NaN, 0f, 0f, 0f)),             // NaN
      (4L, full(Float.NegativeInfinity, 0f, 0f, 0f)), // -Inf
      (5L, full(0f, 0f, 0f, 0f)),                    // zero vector
      (6L, full(1f, 0f, 0f)),                        // wrong dims
      (7L, full(10f, 0f, 0f, 0f)),                   // off-sphere norm
      (8L, Option.empty[Seq[Option[Float]]]),        // null vector
      (9L, full(1e-7f, 1e-7f, 1e-7f, 1e-7f)),        // zero at resolution
      (10L, Some(Seq(Some(1f), None, Some(0f), Some(0f)))), // null ELEMENT
      (11L, full(65504f, 0f, 0f, 0f))                // beyond quantization bound
    ).toDF("vec_id", "embedding")
    val a = Similarity.embedAudit(rows, "vec_id", "embedding", dims,
      normLoE12 = 810000000000L, normHiE12 = 1210000000000L)
      .collect().map(r => r.getLong(0) -> r).toMap
    def keep(id: Long) = a(id).getAs[Boolean]("keep")
    assert(keep(1) && keep(2))
    assert(Seq(3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 11L).forall(!keep(_)))
    // a null element or an unquantizable component must produce a FALSE
    // verdict, never a NULL one (a row the audit cannot judge is a hole)
    assert(!a(10L).getAs[Boolean]("all_finite") && a(10L).getAs[Long]("norm2_e12") == -1L)
    assert(!a(11L).getAs[Boolean]("all_finite") && a(11L).getAs[Long]("norm2_e12") == -1L)
    assert(a(3L).getAs[Long]("norm2_e12") == -1L) // sentinel, never a NaN fold
    assert(!a(3L).getAs[Boolean]("all_finite"))
    assert(a(5L).getAs[Long]("norm2_e12") == 0L)
    assert(!a(6L).getAs[Boolean]("dim_ok"))
    assert(!a(7L).getAs[Boolean]("norm_ok") && a(7L).getAs[Boolean]("all_finite"))
    assert(a(8L).getAs[Boolean]("is_null") && a(8L).getAs[Int]("n_dims") == 0)
    assert(a(9L).getAs[Long]("norm2_e12") == 0L) // micro-quantizes to zero
    assert(a(1L).getAs[Long]("norm2_e12") == 1000000000000L) // exactly 1e12
  }

  test("mipsTopK ranks by inner product where cosine would rank differently") {
    // b has the best DIRECTION for q but tiny magnitude; c has a worse
    // angle but large magnitude — MIPS must prefer c, cosine prefers b
    val corpus = Seq(
      (1L, Seq(0.1f, 0.0f)),   // b: cosine 1.0, dot 0.1
      (2L, Seq(3.0f, 3.0f)),   // c: cosine ~0.707, dot 3.0
      (3L, Seq(-1.0f, 0.0f))   // opposite
    ).toDF("vec_id", "embedding")
    val q = Seq((10L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.mipsTopK(corpus, q, "vec_id", "embedding", 3)
      .orderBy("rnk").collect()
      .map(r => (r.getAs[Long]("nid"), r.getAs[Double]("dot")))
    assert(got.toSeq == Seq((2L, 3.0), (1L, 0.1), (3L, -1.0)))
    val cos = Similarity.cosineTopK(corpus, q, "vec_id", "embedding", 3)
      .orderBy("rnk").collect().map(_.getAs[Long]("nid"))
    assert(cos.head == 1L) // cosine indeed disagrees: direction wins there
  }

  test("knnGraph edges match brute-force within-label ranking") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = Similarity.knnGraph(e, "vec_id", "embedding", "label", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val byId = e.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0d; var na = 0d; var nb = 0d
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    // same 6-dp round + (cosine desc, nid asc) order, recomputed from scratch
    val truth = byId.flatMap { case (id, v, lab) =>
      byId.collect { case (id2, v2, lab2) if lab2 == lab && id2 != id =>
          (id2, BigDecimal(cos(v, v2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        .sortBy { case (nid, c) => (-c, nid) }
        .take(3).zipWithIndex.map { case ((nid, _), i) => (id, i + 1) -> nid }
    }.toMap
    assert(got == truth)
  }

  test("mipsAugment reduces MIPS to cosine: augmented-cosine order == dot order") {
    val rnd = new scala.util.Random(13)
    val corpus = (1L to 80L).map { i =>
      (i, Seq.fill(8)((rnd.nextDouble() * 4 - 2).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") <= 5)
    val (augC, augQ) = Similarity.mipsAugment(corpus, queries, "embedding")
    // augmented corpus vectors all share norm M, so cosine ranking on the
    // augmented pair must equal the exact inner-product ranking
    val viaCos = Similarity.cosineTopK(augC, augQ, "vec_id", "embedding", 10)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rnk")) -> r.getAs[Long]("nid")).toMap
    val viaDot = Similarity.mipsTopK(corpus, queries, "vec_id", "embedding", 10)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rnk")) -> r.getAs[Long]("nid")).toMap
    assert(viaCos == viaDot)
  }

  test("mutualKnn keeps only reciprocal pairs and drops the hub's one-way edges") {
    import spark.implicits._
    // 1 and 2 are near-identical (mutual top-1). 3, 4, 5 all point AT 1
    // (it's their nearest in-cluster vector) but 1's own top-2 is {2, 3}
    // — so (1,2) and (1,3) are mutual, while 4 and 5's edges to 1 are
    // one-way and must drop with k=2.
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f), 0),
      (2L, Seq(0.99f, 0.1f, 0.0f), 0),
      (3L, Seq(0.9f, 0.3f, 0.0f), 0),
      (4L, Seq(0.8f, -0.4f, 0.2f), 0),
      (5L, Seq(0.8f, -0.35f, -0.3f), 0)
    ).toDF("vec_id", "embedding", "label")
    val pairs = Similarity.mutualKnn(vecs, "vec_id", "embedding", "label", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val knn = Similarity.knnGraph(vecs, "vec_id", "embedding", "label", 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // every mutual pair is present both ways in the kNN graph, and every
    // both-ways kNN pair is mutual — exact equivalence, not containment
    val wantMutual = knn.filter { case (a, b) => a < b && knn.contains((b, a)) }
    assert(pairs == wantMutual)
    assert(pairs.contains((1L, 2L)))
    // 4 -> 1 exists one-way but never mutually
    assert(knn.contains((4L, 1L)) && !pairs.contains((1L, 4L)))
  }

  test("mutualKnnSrp == both-ways pairs of the SRP top-k graph") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val g = Similarity.annTopKSrp(e, e, "vec_id", "embedding", k = 3,
        nPlanes = Similarity.srpPlanesFor(e.count()), salt = "mk1")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val want = g.filter { case (a, b) => a < b && g.contains((b, a)) }
    val got = Similarity.mutualKnnSrp(e, "vec_id", "embedding", k = 3,
        nPlanes = Similarity.srpPlanesFor(e.count()), salt = "mk1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("pcaTopComponent recovers a planted dominant direction, deterministically") {
    // 40 vectors along ±(1,1,0,0)/√2 with small (0,0,1,-1) noise: the top
    // Gram eigenvector is (1,1,0,0)/√2 — components 0 and 1 equal and
    // dominant, 2 and 3 near zero. Sign is pinned by the all-ones start.
    val rows = (0 until 40).map { i =>
      val main = if (i % 2 == 0) 1f else -1f        // ± along the plane
      val noise = (i % 5 - 2) * 0.02f
      (i.toLong, Seq(main + noise, main - noise, noise, -noise))
    }
    val df = rows.toDF("vec_id", "embedding")
    val v = Similarity.pcaTopComponent(df, "embedding", quant = 64, iters = 8)
      .orderBy("idx").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(v.length == 4)
    val comps = v.map(_._2)
    // dominant pair: equal by symmetry, at the 1e6 normalization ceiling
    assert(comps(0) == comps(1))
    assert(math.abs(comps(0)) >= 900000L)
    // orthogonal pair: an order of magnitude smaller
    assert(math.abs(comps(2)) < 200000L && math.abs(comps(3)) < 200000L)
    // g_diag carries the raw per-dimension energy: dims 0/1 dominate
    assert(v(0)._3 > v(2)._3 * 10)
    // byte-for-byte deterministic across plans
    val again = Similarity.pcaTopComponent(df, "embedding", quant = 64, iters = 8)
      .orderBy("idx").collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == v.toSeq)
  }

  test("pcaTopComponent: empty and null-only input yields an empty frame") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Similarity.pcaTopComponent(empty, "embedding").isEmpty)
    val nulls = Seq((1L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding")
    assert(Similarity.pcaTopComponent(nulls, "embedding").isEmpty)
  }

  test("srpPlanesFor holds mean bucket occupancy at 32, floors at 4, caps at 16") {
    assert(Similarity.srpPlanesFor(1) == 4)
    assert(Similarity.srpPlanesFor(500) == 4)    // sf0.01 fixture
    assert(Similarity.srpPlanesFor(512) == 4)    // exact boundary: 32*2^4
    assert(Similarity.srpPlanesFor(513) == 5)
    assert(Similarity.srpPlanesFor(2000) == 6)   // sf0.1 fixture
    assert(Similarity.srpPlanesFor(20000) == 10) // 10x fixture
    assert(Similarity.srpPlanesFor(32L << 16) == 16)
    assert(Similarity.srpPlanesFor((32L << 16) + 1) == 16) // cap, mirrored by the oracle's coalesce
    assert(Similarity.srpPlanesFor(1L << 40) == 16)
  }

  test("mmrSelect: diversity beats relevance rank (hand-computed greedy)") {
    import spark.implicits._
    // anchor v0=(1,0); rel = milli dot with v0
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),    // anchor (excluded from candidates)
      (1L, Seq(0.9f, 0.1f)),    // rel 900000
      (2L, Seq(0.89f, 0.11f)),  // rel 890000 but near-dup of v1
      (3L, Seq(0.1f, 0.9f)),    // rel 100000
      (4L, Seq(-0.5f, 0.2f))    // rel -500000, most diverse
    ).toDF("vec_id", "embedding")
    val r = Similarity.mmrSelect(emb, "vec_id", "embedding",
        anchorId = 0L, poolSize = 4, k = 3).collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    // rank1 = argmax rel = v1; rank2: v2 mmr = 890000-812000 = 78000 wins;
    // rank3: v3 mmr = 100000-188000 = -88000 LOSES to v4's
    // -500000-(-423000) = -77000 -> diversity overrides the rel order
    // (pure top-3 would be v1,v2,v3)
    assert(r.toSeq == Seq(
      (1, 1L, 900000L, 900000L),
      (2, 2L, 890000L, 78000L),
      (3, 4L, -500000L, -77000L)))
  }

  test("kcenterSelect: farthest-point traversal order (hand-computed)") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),   // seed (lowest id), milli (1000,0)
      (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.89f, 0.11f)),
      (3L, Seq(0.1f, 0.9f)),
      (4L, Seq(-0.5f, 0.2f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.kcenterSelect(emb, "vec_id", "embedding", k = 3).collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2)))
    // round 2: v4 is farthest from v0 (1500^2+200^2 = 2290000);
    // round 3: min-dist-to-{v0,v4} maximized by v3 (min(1620000, 850000))
    assert(r.toSeq == Seq((1, 0L, 0L), (2, 4L, 2290000L), (3, 3L, 850000L)))
  }
}
