package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = (1L to n.toLong).toDF("id")
    .withColumn("src", concat(lit("s"), pmod(col("id"), lit(3))))

  test("bucket matches the reference md5 arithmetic for a known value") {
    // md5('42:split') = 58ad5b25... → 0x58ad5b25 = 1487756069 → % 10000
    val b = Seq(42L).toDF("id")
      .select(Sampling.hashBucket(col("id"), "split").as("b"))
      .head().getLong(0)
    assert(b == 1487756069L % 10000)
  }

  test("cluster-keyed split is leakage-free where the id split is not") {
    // near-dup pairs chain ids into clusters; splitting on cluster_id
    // must put every member on ONE side, while the naive id split
    // separates at least one pair (the eval-contamination bug ext100
    // exists to prevent)
    val docs = (1L to 400L).toDF("doc_id")
    val pairs = (1L to 200L).map(i => (i, i + 200L)).toDF("doc_a", "doc_b")
    val cl = Dedup.clusters(docs, "doc_id", pairs)
    val byCluster = Sampling.split(cl, "cluster_id", "seedX")
    val splitsPerCluster = byCluster.groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("n")).agg(max(col("n"))).head().getLong(0)
    assert(splitsPerCluster == 1L)
    // the same pairs under the naive doc_id split: some pair straddles
    val naive = Sampling.split(docs, "doc_id", "seedX")
      .select(col("doc_id"), col("split"))
    val straddling = pairs
      .join(naive.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("split", "sa"), "doc_a")
      .join(naive.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("split", "sb"), "doc_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(straddling > 0)
  }

  test("split is deterministic, exhaustive, and ~80/10/10") {
    val s1 = Sampling.split(ids(5000), "id", "seed1")
    val s2 = Sampling.split(ids(5000), "id", "seed1")
    assert(s1.collect().toSet == s2.collect().toSet) // same salt → identical
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 5000)
    assert(math.abs(counts("train") - 4000) < 200) // 32-bit hash ⇒ tight
    assert(math.abs(counts("val") - 500) < 100)
    assert(math.abs(counts("test") - 500) < 100)
  }

  test("a different salt reshuffles assignments; growth never reassigns") {
    val a = Sampling.split(ids(1000), "id", "seed1").select("id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.split(ids(1000), "id", "seed2").select("id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.count { case (k, v) => b(k) != v } > 100) // genuinely resampled
    // incremental stability: the same ids inside a larger corpus keep
    // their assignment (the whole point vs fraction-based sampling)
    val grown = Sampling.split(ids(2000), "id", "seed1").select("id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.forall { case (k, v) => grown(k) == v })
  }

  test("stratified rates bound each stratum; 10000 keeps all, 0 keeps none") {
    val df = ids(3000)
    val kept = Sampling.stratifiedSample(df, "id", "src",
      Map("s0" -> 10000, "s1" -> 0), defaultPerMyriad = 5000, salt = "m")
    val bySrc = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("s0") == 1000)          // rate 10000 = keep every row
    assert(!bySrc.contains("s1"))        // rate 0 = keep none
    val s2 = bySrc("s2")                 // default 5000 ≈ half
    assert(s2 > 350 && s2 < 650)
    // kept rows are a strict subset with their buckets below the rate
    assert(kept.filter(col("src") === "s2" && col("bucket") >= 5000).count() == 0)
  }

  test("temperatureWeights: exact sqrt-micros arithmetic, α=1/2 flattening") {
    // counts 100 / 25 / 4 → sqrt_e6 10e6 / 5e6 / 2e6, total 17e6:
    // weights floor(10/17·1e6+.5)=588235, 294118, 117647
    val df = (1 to 100).map(_ => "a") ++ (1 to 25).map(_ => "b") ++ (1 to 4).map(_ => "c")
    val r = Sampling.temperatureWeights(df.toDF("src"), "src").collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r("a") == ((100L, 10000000L, 588235L)))
    assert(r("b") == ((25L, 5000000L, 294118L)))
    assert(r("c") == ((4L, 2000000L, 117647L)))
    // flattening: small source's weight share (11.8%) ≫ doc share (3.1%)
    val weightShare = r("c")._3.toDouble / r.values.map(_._3).sum
    val docShare = 4.0 / 129.0
    assert(weightShare > 2 * docShare)
  }

  test("invalid fractions are rejected at call time") {
    intercept[IllegalArgumentException] {
      Sampling.split(ids(10), "id", "s", 9000, 2000)
    }
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(ids(10), "id", "src", Map("s0" -> 10001), 0, "s")
    }
  }

  test("mixtureSample: hand-computed rates, cap at full keep, bucket verdicts") {
    import spark.implicits._
    val df = ((1L to 100L).map(i => (i, "A")) ++ (1001L to 1004L).map(i => (i, "B")))
      .toDF("id", "src")
    // sqrt_e6: A 10e6, B 2e6; tot 12e6; weights 833333 / 166667
    // budget 60: rate_A = floor(60*833333/10000 + 0.5) = 5000
    //            rate_B = floor(60*166667/400 + 0.5) = 25001 -> capped 10000
    val r = Sampling.mixtureSample(df, "id", "src", budgetDocs = 60L, salt = "mix")
      .collect()
    val byStratum = r.groupBy(_.getString(1))
    assert(byStratum("A").forall(_.getLong(3) == 5000L))
    assert(byStratum("B").map(_.getLong(0)).sorted.toSeq == (1001L to 1004L)) // cap keeps all
    assert(byStratum("B").forall(_.getLong(3) == 10000L))
    assert(r.forall(x => x.getLong(2) < x.getLong(3))) // kept iff bucket < rate
  }

  test("applyMixtureRates keeps strata missing from the rate frame by default") {
    import spark.implicits._
    val df = Seq((1L, "known"), (2L, "brand-new")).toDF("id", "src")
    val rates = Seq(("known", 0L)).toDF("src", "rate_per_myriad") // drop all known
    val r = Sampling.applyMixtureRates(df, rates, "id", "src", "s")
      .collect().map(x => x.getString(1) -> x.getLong(3)).toMap
    assert(r == Map("brand-new" -> 10000L)) // new source kept, known dropped
    // explicit default 0 = drop-unknown policy
    assert(Sampling.applyMixtureRates(df, rates, "id", "src", "s", 0).isEmpty)
  }

  test("groupCap keeps exactly the top-k per group under the declared order") {
    val df = Seq(
      ("a", 1L, 50), ("a", 2L, 90), ("a", 3L, 90), ("a", 4L, 10),
      ("b", 5L, 7), ("c", 6L, 1), ("c", 7L, 2)
    ).toDF("src", "id", "score")
    val got = Sampling.groupCap(df, "src", 2, Seq(col("score").desc, col("id")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getAs[Int]("cap_rank"))).toSet
    // score tie at 90 breaks by id: 2 before 3; group b smaller than k
    assert(got == Set(("a", 2L, 1), ("a", 3L, 2), ("b", 5L, 1), ("c", 7L, 1), ("c", 6L, 2)))
  }

  test("groupCap plans as WindowGroupLimit (map-side top-k before the exchange)") {
    val df = (1L to 200L).toDF("id")
      .withColumn("src", pmod(col("id"), lit(5)))
    val plan = Sampling.groupCap(df, "src", 3, Seq(col("id")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k filter must rewrite to WindowGroupLimit; plan was:\n$plan")
  }

  test("budgetSample keeps exactly the budget-bounded permutation prefix per group") {
    val rnd = new scala.util.Random(11)
    val df = (1L to 600L).map(i => (i, s"s${i % 3}", 1L + rnd.nextInt(40).toLong))
      .toDF("id", "src", "toks")
    val got = Sampling.budgetSample(df, "id", "src", "toks", 800L, "m0")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("cum_tokens")).toMap
    // independent replay: per group, order by (md5(id:m0), id), running
    // sum, keep while <= budget
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long) = md.digest(s"$id:m0".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (_, xs) =>
      var cum = 0L
      xs.toSeq.sortBy(x => (key(x._1), x._1)).flatMap { case (id, _, t) =>
        cum += t
        if (cum <= 800L) Some(id -> cum) else None
      }
    }.toMap
    assert(got == expected)
    // the cut is a PREFIX: nothing kept after the first overflow
    assert(got.values.forall(_ <= 800L))
  }

  test("priorityBudgetSample takes the best-first prefix, hash-sampling ties") {
    val rnd = new scala.util.Random(23)
    val df = (1L to 500L).map(i =>
      (i, (rnd.nextInt(5) * 250).toLong, 1L + rnd.nextInt(30).toLong))
      .toDF("id", "prio", "toks") // fat tie classes at 5 priority levels
    val got = Sampling.priorityBudgetSample(df, "id", "prio", "toks", 900L, "p0")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("cum_tokens")).toMap
    // independent replay: order by (prio DESC, md5(id:p0), id), running
    // sum, keep while <= budget
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long) = md.digest(s"$id:p0".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    var cum = 0L
    val expected = rows.toSeq.sortBy(x => (-x._2, key(x._1), x._1)).flatMap {
      case (id, _, t) =>
        cum += t
        if (cum <= 900L) Some(id -> cum) else None
    }.toMap
    assert(got == expected)
    assert(got.nonEmpty && got.values.forall(_ <= 900L))
  }

  test("shuffleShards is a salt-keyed permutation with exact shard arithmetic") {
    val df = (1L to 1000L).toDF("doc_id")
    val s1 = Sampling.shuffleShards(df, "doc_id", "e0", 64L).collect()
    // bijection: every (shard, pos) cell hit exactly once, all shards
    // full except the last, positions within bounds
    assert(s1.length == 1000)
    val cells = s1.map(r => (r.getAs[Long]("shard"), r.getAs[Long]("shard_pos")))
    assert(cells.distinct.length == 1000)
    assert(cells.map(_._1).max == (1000 - 1) / 64)
    assert(cells.forall { case (s, p) => p >= 0 && p < 64 && s >= 0 })
    val fullShards = cells.groupBy(_._1).map { case (s, xs) => s -> xs.length }
    assert(fullShards.filter(_._2 != 64).keys.forall(_ == cells.map(_._1).max))
    // determinism + independent md5 replay of the permutation
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long) = md.digest(s"$id:e0".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expected = (1L to 1000L).sortBy(id => (key(id), id)).zipWithIndex
      .map { case (id, i) => id -> ((i / 64).toLong, (i % 64).toLong) }.toMap
    assert(s1.map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("shard"), r.getAs[Long]("shard_pos")))).toMap == expected)
    // a different salt is a genuinely different permutation
    val s2 = Sampling.shuffleShards(df, "doc_id", "e1", 64L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard_pos")).toMap
    val s1m = s1.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard_pos")).toMap
    assert((1L to 1000L).count(id => s1m(id) != s2(id)) > 800)
  }

  test("groupSample: exactly n per group, deterministic, == the window form") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 500L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "source")
      .repartition(9)
    val got = Sampling.groupSample(df, "doc_id", "source", n = 15, salt = "ev")
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(got.groupBy(_._1).forall(_._2.size == 15))
    // the oracle shape: bottom-15 of the md5 permutation per group
    val w = Window.partitionBy("source")
      .orderBy(md5(concat(col("doc_id").cast("string"), lit(":ev"))), col("doc_id"))
    val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 15)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(got == want)
    // a group smaller than n keeps everything
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "source")
    assert(Sampling.groupSample(tiny, "doc_id", "source", 10, "x").count() == 3)
  }

  test("systematicSample: multiplicities match the brute-force pick positions") {
    val df = Seq((1L, 5L), (2L, 1L), (3L, 12L), (4L, 3L), (5L, 0L))
      .toDF("doc_id", "w")
    val k = 7
    val got = Sampling.systematicSample(df, "doc_id", "w", k, "t1")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    // brute force: replay the md5 permutation and walk every position
    val perm = df.filter(col("w") > 0)
      .withColumn("__k", md5(concat(col("doc_id").cast("string"), lit(":t1"))))
      .orderBy(col("__k"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val wTotal = perm.map(_._2).sum
    val positions = (0 until k).map(i => (2L * i + 1) * wTotal / (2L * k))
    var cum = 0L
    val want = perm.map { case (id, w) =>
      val n = positions.count(p => p >= cum && p < cum + w)
      cum += w
      id -> n.toLong
    }.filter(_._2 > 0).toMap
    assert(got == want)
    assert(got.values.sum == k)            // SUS invariant: exactly k picks
    assert(!got.contains(5L))              // zero-weight rows never picked
    assert(got(3L) >= 1L)                  // w >= W/k is a guaranteed pick
  }

  test("systematicSample: n_picks sums to k on the fixture and is deterministic") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("n_tokens",
        size(filter(split(trim(col("text")), "\\s+"), t => t =!= "")).cast("long"))
    val a = Sampling.systematicSample(docs, "doc_id", "n_tokens", 100, "sus1")
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(a.map(_._2).sum == 100L)
    val b = Sampling.systematicSample(docs, "doc_id", "n_tokens", 100, "sus1")
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(a.toSeq.sorted == b.toSeq.sorted)
  }
}
