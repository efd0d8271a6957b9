package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  // Zipf-ish corpus: item i appears ~ceil(600/i) times, shuffled across
  // partitions so map-side partial sketches genuinely merge.
  private def corpus() = {
    val items = (1 to 200).flatMap(i => Seq.fill(600 / i + 1)(s"tok_$i"))
    spark.createDataset(rnd.shuffle(items)).repartition(8).toDF("item")
  }

  test("estimate >= exact count for EVERY item — the deterministic CMS guarantee") {
    val df = corpus()
    val probes = (1 to 200).map(i => s"tok_$i") ++ Seq("never_seen_a", "never_seen_b")
    val out = CountMin.estimates(df, col("item"), probes.toDF("item"),
      col("item"), d = 3, w = 64) // w FAR below |domain| → real collisions
      .collect()
    assert(out.length == probes.distinct.length)
    out.foreach { r =>
      val (est, cnt, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= cnt, s"${r.getString(0)}: est $est < exact $cnt")
      assert(over == est - cnt)
    }
    // absent probes: exact 0, estimate still >= 0
    val absent = out.filter(_.getString(0).startsWith("never_seen"))
    assert(absent.length == 2 && absent.forall(_.getLong(2) == 0L))
  }

  test("exact counts match a plain groupBy truth") {
    val df = corpus()
    val truth = df.groupBy("item").count().as[(String, Long)].collect().toMap
    val out = CountMin.estimates(df, col("item"),
      (1 to 50).map(i => s"tok_$i").toDF("item"), col("item"), d = 4, w = 2048)
      .as[(String, Long, Long, Long)].collect()
    out.foreach { case (item, _, cnt, _) => assert(cnt == truth(item)) }
  }

  test("sketch is bounded at d*w rows and merges by cell-wise sum") {
    val df = corpus()
    val (d, w) = (4, 32)
    val whole = CountMin.sketch(df, col("item"), d, w)
    assert(whole.count() <= d.toLong * w)
    // CMS(A union B) == cell-wise sum of CMS(A) and CMS(B)
    val a = df.filter(md5(col("item")).startsWith("a"))
    val b = df.filter(!md5(col("item")).startsWith("a"))
    val summed = CountMin.sketch(a, col("item"), d, w)
      .unionByName(CountMin.sketch(b, col("item"), d, w))
      .groupBy("r", "bucket").agg(sum("cnt").as("cnt"))
    assert(whole.except(summed).isEmpty && summed.except(whole).isEmpty)
  }

  test("wide sketch with no colliding probes estimates exactly") {
    // 20 distinct items into w = 2^16 cells: verify est == cnt for all
    // probes UNLESS two probe items share a bucket in every row (then
    // the overcount is still >= 0 — asserted above); with d=4 the
    // fixture has no such pair, making this a value-exactness check.
    val small = (1 to 20).flatMap(i => Seq.fill(i)(s"item_$i"))
    val df = spark.createDataset(small).repartition(4).toDF("item")
    val out = CountMin.estimates(df, col("item"),
      (1 to 20).map(i => s"item_$i").toDF("item"), col("item"),
      d = 4, w = 65536).as[(String, Long, Long, Long)].collect()
    out.foreach { case (item, est, cnt, over) =>
      assert(est == cnt && over == 0L, s"$item: est $est != cnt $cnt")
    }
  }

  test("weighted: est_w >= exact weight sum for every probe, under real collisions") {
    val rows = (1 to 150).flatMap { i =>
      Seq.fill(i % 5 + 1)((s"acct_$i", (i * 7 + 3).toLong))
    }
    val df = spark.createDataset(rnd.shuffle(rows)).repartition(8)
      .toDF("item", "wt")
    val probes = ((1 to 150).map(i => s"acct_$i") :+ "acct_none").toDF("item")
    val out = CountMin.estimatesWeighted(df, col("item"), col("wt"),
      probes, col("item"), d = 3, w = 32)
      .as[(String, Long, Long, Long)].collect()
    val truth = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(out.length == 151)
    out.foreach { case (item, est, ws, over) =>
      assert(ws == truth.getOrElse(item, 0L))
      assert(est >= ws && over == est - ws, s"$item: $est < $ws")
    }
  }

  test("weighted: zero, negative, and null weights are excluded from sketch and certification") {
    val df = Seq(("a", Some(5L)), ("a", Some(0L)), ("a", Some(-3L)),
      ("a", None), ("b", Some(2L))).toDF("item", "wt")
    val out = CountMin.estimatesWeighted(df, col("item"), col("wt"),
      Seq("a", "b").toDF("item"), col("item"), d = 2, w = 64)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("a")._3 == 5L && out("b")._3 == 2L)
    assert(out("a")._2 >= 5L && out("b")._2 >= 2L)
  }

  test("null items and null probes are excluded") {
    val df = Seq(Some("x"), None, Some("x"), Some("y"), None)
      .toDF("item")
    val out = CountMin.estimates(df, col("item"),
      Seq(Some("x"), None, Some("z")).toDF("item"), col("item"),
      d = 2, w = 16).as[(String, Long, Long, Long)].collect()
    assert(out.map(_._1).toSet == Set("x", "z"))
    assert(out.find(_._1 == "x").get._3 == 2L)
    assert(out.find(_._1 == "z").get._3 == 0L)
  }
}
