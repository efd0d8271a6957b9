package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.TextAnalysis

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  test("candidate array is a superset of every item above n/(k+1)") {
    // 2000 distinct light items (1 occurrence each) + 3 heavy items,
    // spread across partitions so partials genuinely merge
    val light = (1 to 2000).map(i => s"light_$i")
    val heavy = Seq.fill(400)("alpha") ++ Seq.fill(300)("beta") ++ Seq.fill(200)("gamma")
    val df = spark.createDataset(scala.util.Random.shuffle(light ++ heavy))
      .repartition(8).toDF("item")
    val n = 2000 + 900
    val k = 16 // threshold n/(k+1) = 170.6 — all three heavies qualify
    val cands = df.agg(expr(s"misra_gries(item, $k)").as("c"))
      .selectExpr("explode(c) AS item").as[String].collect().toSet
    assert(cands.size <= k)
    assert(Set("alpha", "beta", "gamma").subsetOf(cands))
    assert(n / (k + 1) < 200) // the guarantee actually covers gamma
  }

  test("buffer never exceeds k and survives serialize round-trip") {
    val mg = MisraGries(org.apache.spark.sql.catalyst.expressions.Literal("x"), 4)
    val buf = mg.createAggregationBuffer()
    import org.apache.spark.unsafe.types.UTF8String
    Seq("a", "b", "c", "d", "e", "a", "a", "f", "b").foreach { s =>
      val other = mg.createAggregationBuffer()
      other.put(UTF8String.fromString(s), 1L)
      mg.merge(buf, other): Unit
    }
    assert(buf.size() <= 4)
    val round = mg.deserialize(mg.serialize(buf))
    assert(round == buf)
  }

  test("merge subtracts the (k+1)-th largest and keeps error additive") {
    import org.apache.spark.unsafe.types.UTF8String
    val mg = MisraGries(org.apache.spark.sql.catalyst.expressions.Literal("x"), 2)
    val a = mg.createAggregationBuffer()
    a.put(UTF8String.fromString("p"), 10L)
    a.put(UTF8String.fromString("q"), 4L)
    val b = mg.createAggregationBuffer()
    b.put(UTF8String.fromString("r"), 6L)
    b.put(UTF8String.fromString("q"), 3L)
    val m = mg.merge(a, b)
    // counters: p=10, q=7, r=6 → 3rd largest is 6 → p=4, q=1, r dropped
    assert(m.size() == 2)
    assert(m.get(UTF8String.fromString("p")) == 4L)
    assert(m.get(UTF8String.fromString("q")) == 1L)
  }

  test("heavyHitters end-to-end: exact counts, exact membership") {
    val light = (1 to 500).map(i => s"light_$i")
    val heavy = Seq.fill(120)("hot") ++ Seq.fill(90)("warm")
    val df = spark.createDataset(scala.util.Random.shuffle(light ++ heavy))
      .repartition(8).toDF("item")
    val k = 8 // n = 710, threshold 710/9 = 78.9 → hot and warm qualify
    val out = TextAnalysis.heavyHitters(df, col("item"), k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(("hot", 120L, 710L), ("warm", 90L, 710L)))
  }

  test("heavyHittersPerGroup: each group gets its own exact threshold") {
    // group g1: n=710, hot(120) and warm(90) clear 710/9=78.9
    // group g2: n=40, only solo(10) clears 40/9=4.4 — the SAME item
    //           counts that are heavy in a small group are light in a
    //           big one, which a global threshold would miss
    val g1 = (1 to 500).map(i => ("g1", s"light_$i")) ++
      Seq.fill(120)(("g1", "hot")) ++ Seq.fill(90)(("g1", "warm"))
    val g2 = (1 to 30).map(i => ("g2", s"x_$i")) ++ Seq.fill(10)(("g2", "solo"))
    val df = spark.createDataset(scala.util.Random.shuffle(g1 ++ g2))
      .repartition(8).toDF("grp", "item")
    val out = TextAnalysis.heavyHittersPerGroup(df, "grp", col("item"), 8)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set(
      ("g1", "hot", 120L, 710L), ("g1", "warm", 90L, 710L),
      ("g2", "solo", 10L, 40L)))
  }

  test("heavyHittersPerGroup: null group keys are excluded, not silently lost") {
    val df = Seq((Some("g"), "a"), (Some("g"), "a"), (Some("g"), "a"),
        (None: Option[String], "z"), (None, "z"), (None, "z"))
      .toDF("grp", "item")
    val out = TextAnalysis.heavyHittersPerGroup(df, "grp", col("item"), 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // the null group contributes NOTHING (documented exclusion, not a
    // sketched-then-dropped half-state); g's n is 3, not 6
    assert(out == Set(("g", "a", 3L, 3L)))
  }

  test("weightedHeavyHitters: exact weighted census, count-heavy but weight-light loses") {
    // 'often' appears 200 times at weight 1 (count-heavy, mass 200);
    // 'whale' appears 4 times at weight 900 (mass 3600); 600 light
    // items carry weight 5 each (mass 3000). W = 6800, k = 8 →
    // threshold 6800/9 = 755.6: whale qualifies, often does NOT —
    // the census a count-based heavy hitter gets exactly wrong.
    val rows = Seq.fill(200)(("often", 1L)) ++ Seq.fill(4)(("whale", 900L)) ++
      (1 to 600).map(i => (s"light_$i", 5L))
    val df = spark.createDataset(scala.util.Random.shuffle(rows))
      .repartition(8).toDF("item", "w")
    val out = TextAnalysis.weightedHeavyHitters(df, col("item"), col("w"), 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(("whale", 3600L, 6800L)))
    // zero/negative/null weights excluded from W and candidates
    val df2 = Seq(("a", Some(5L)), ("a", Some(5L)), ("b", Some(0L)),
      ("c", Some(-3L)), ("d", None: Option[Long])).toDF("item", "w")
    val out2 = TextAnalysis.weightedHeavyHitters(df2, col("item"), col("w"), 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out2 == Set(("a", 10L, 10L)))
  }

  test("null items are excluded from n and from candidates") {
    val df = Seq(Some("a"), Some("a"), Some("a"), None, Some("b")).toDF("item")
    val out = TextAnalysis.heavyHitters(df, col("item"), 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // n = 4 (null excluded); threshold 4/3 — a(3) qualifies, b(1) not
    assert(out == Set(("a", 3L, 4L)))
  }
}
