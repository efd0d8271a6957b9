package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GlobalSortSpec extends SparkSpec {
  import spark.implicits._

  test("row numbers are the exact global sort order, 1..N, no gaps") {
    val df = (1 to 1000).map(i => (i * 37 % 1000, i.toLong)).toDF("k", "uid")
      .repartition(7)
    val numbered = GlobalSort.withRowNumber(df, "rn", col("k").asc, col("uid").asc)
      .collect().sortBy(_.getAs[Long]("rn"))
    assert(numbered.map(_.getAs[Long]("rn")).toSeq == (1L to 1000L))
    val keys = numbered.map(r => (r.getInt(0), r.getLong(1)))
    assert(keys.toSeq == keys.toSeq.sorted)
  }

  test("exactPercentiles equals brute-force order statistics, duplicates included") {
    // heavy duplication + skew: 500 copies of 7, a long uniform tail,
    // spread over partitions — the exact rank must cut through the
    // duplicate run correctly
    val vals = Seq.fill(500)(7.0) ++ (1 to 1500).map(_ / 10.0)
    val df = spark.createDataset(scala.util.Random.shuffle(vals))
      .repartition(8).toDF("x")
    val qs = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    val got = GlobalSort.exactPercentiles(df, col("x"), qs, accuracy = 200)
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSet
    val sorted = vals.sorted
    val expected = qs.map { q =>
      val r = math.floor(q * (vals.size - 1)).toLong + 1
      (q, sorted((r - 1).toInt), r)
    }.toSet
    assert(got == expected)
  }

  test("exactPercentiles: small n (below accuracy) is exact, not a crash") {
    // the review-found case: 103 distinct values at default accuracy —
    // the 3/accuracy pad covers < 1 rank there, so the bracket must
    // fall back to the whole domain instead of tripping the pick guard
    val df = (1 to 103).map(_.toDouble).toDF("x").repartition(4)
    val got = GlobalSort.exactPercentiles(df, col("x"), Seq(0.9, 0.99))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSet
    // r = floor(q*102)+1: 0.9 -> 92 -> value 92.0; 0.99 -> 101 -> 101.0
    assert(got == Set((0.9, 92.0, 92L), (0.99, 101.0, 101L)))
  }

  test("exactPercentiles: nulls excluded, low accuracy still exact") {
    val df = (Seq[Option[Double]](None, None) ++ (1 to 999).map(i => Some(i.toDouble)))
      .toDF("x").repartition(5)
    val got = GlobalSort.exactPercentiles(df, col("x"), Seq(0.5), accuracy = 100)
      .head()
    // n = 999, r = floor(0.5*998)+1 = 500 → value 500.0
    assert(got.getDouble(1) == 500.0 && got.getLong(2) == 500L)
  }

  test("exactPercentiles: seeded-random sweep equals brute-force order statistics") {
    val rnd = new scala.util.Random(20260815L)
    (1 to 8).foreach { _ =>
      val n = 200 + rnd.nextInt(2000)
      // duplicate-rich skewed values: a hot value plus a heavy tail
      val hot = rnd.nextInt(50).toDouble
      val vals = Seq.fill(n / 4)(hot) ++
        Seq.fill(n - n / 4)(math.floor(rnd.nextDouble() * 500) / 10.0)
      val qs = Seq(rnd.nextDouble(), rnd.nextDouble(), 0.0, 1.0).distinct
      val accuracy = 100 + rnd.nextInt(3) * 450 // 100 / 550 / 1000
      val df = spark.createDataset(rnd.shuffle(vals)).repartition(6).toDF("x")
      val got = GlobalSort.exactPercentiles(df, col("x"), qs, accuracy)
        .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSet
      val sorted = vals.sorted
      val expected = qs.map { q =>
        val r = math.floor(q * (vals.size - 1)).toLong + 1
        (q, sorted((r - 1).toInt), r)
      }.toSet
      assert(got == expected, s"n=$n accuracy=$accuracy qs=$qs")
    }
  }

  test("exactPercentilesByGroup: seeded-random sweep equals per-group brute force") {
    val rnd = new scala.util.Random(99L)
    (1 to 5).foreach { _ =>
      val groups = Seq("a", "b", "c")
      val rows = groups.flatMap { g =>
        val n = 150 + rnd.nextInt(1500)
        Seq.fill(n)((g, math.floor(rnd.nextDouble() * 300) / 10.0))
      }
      val qs = Seq(rnd.nextDouble(), 0.5, 1.0).distinct
      val df = spark.createDataset(rnd.shuffle(rows)).repartition(6).toDF("g", "x")
      val got = GlobalSort.exactPercentilesByGroup(df, "g", col("x"), qs,
          accuracy = 100 + rnd.nextInt(2) * 900)
        .collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
        .toSet
      val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
        val sorted = rs.map(_._2).sorted
        qs.map { q =>
          val r = math.floor(q * (sorted.size - 1)).toLong + 1
          (g, q, sorted((r - 1).toInt), r)
        }
      }.toSet
      assert(got == expected)
    }
    // null groups and null values excluded
    val df2 = Seq((Some("g"), Some(1.0)), (Some("g"), Some(2.0)),
      (Some("g"), Some(3.0)), (None: Option[String], Some(9.0)),
      (Some("g"), None: Option[Double])).toDF("g", "x")
    val out = GlobalSort.exactPercentilesByGroup(df2, "g", col("x"), Seq(1.0))
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getLong(3))).toSet
    assert(out == Set(("g", 3.0, 3L)))
  }

  test("interdecileMeanByGroup trims by decile VALUE, brute-force-checked") {
    import spark.implicits._
    // group "a": 1..20 → n=20, r10 = floor(0.1*19)+1 = 2 → v10 = 2,
    // r90 = floor(0.9*19)+1 = 18 → v90 = 18; kept 2..18 (17 values,
    // sum 170) → mean_milli = 170000/17 = 10000. Group "b": a tie-heavy
    // set where value-trimming keeps ALL copies of the boundary value.
    val df = ((1 to 20).map(i => ("a", i.toLong)) ++
      Seq(("b", 5L), ("b", 5L), ("b", 5L), ("b", 100L))).toDF("g", "x")
    val got = GlobalSort.interdecileMeanByGroup(df, "g", col("x"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got("a") == (20L, 2L, 18L, 17L, 10000L))
    // b: n=4, r10 = floor(0.3)+1 = 1 → v10 = 5; r90 = floor(2.7)+1 = 3
    // → v90 = 5; kept = the three 5s (100 is out), mean exactly 5000
    assert(got("b") == (4L, 5L, 5L, 3L, 5000L))
  }

  test("numbering matches single-partition row_number exactly") {
    val df = Seq(("b", 1L), ("a", 2L), ("a", 1L), ("c", 0L)).toDF("k", "uid")
    val got = GlobalSort.withRowNumber(df, "rn", col("k").asc, col("uid").asc)
      .select("k", "uid", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._3)
    assert(got.toSeq == Seq(("a", 1L, 1L), ("a", 2L, 2L), ("b", 1L, 3L), ("c", 0L, 4L)))
  }
}
