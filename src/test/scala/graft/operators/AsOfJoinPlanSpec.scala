package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._


/** [[AsOfJoin.joinPlanned]] — the native merge-scan as-of operator
  * ([[graft.plans.AsOfJoinExec]]): equivalence with the union+window
  * form, the zero-exchange co-partitioned path it exists for, and the
  * row-level null semantics it refines. */
class AsOfJoinPlanSpec extends SparkSpec {
  import spark.implicits._

  private def randomSides(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val probes = (1 to 400).map(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "ts", "probe_id")
    val quotes = (1 to 300).map(i =>
      (rnd.nextInt(14).toLong, rnd.nextInt(1000).toLong, i * 10L))
      .toDF("k", "ts", "quote")
      // unique (k, ts) per quote so ties can't make either form ambiguous
      .groupBy("k", "ts").agg(max("quote").as("quote"))
    (probes, quotes)
  }

  test("planned merge scan == union+window form on random data") {
    for (seed <- Seq(1, 7, 42)) {
      val (probes, quotes) = randomSides(seed)
      val got = AsOfJoin.joinPlanned(probes, quotes, Seq("k"), "ts", "ts")
        .select("k", "ts", "probe_id", "quote")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
      val want = AsOfJoin.join(probes, quotes, Seq("k"), "ts", "ts")
        .select("k", "ts", "probe_id", "quote")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
      assert(got == want, s"seed=$seed")
    }
  }

  test("ties at equal (key, ts): right row at exactly left.ts matches (>= semantics)") {
    val probes = Seq((1L, 100L, 1L)).toDF("k", "ts", "probe_id")
    val quotes = Seq((1L, 100L, 7L), (1L, 99L, 5L)).toDF("k", "ts", "quote")
    val out = AsOfJoin.joinPlanned(probes, quotes, Seq("k"), "ts", "ts").collect()
    assert(out.length == 1 && out.head.getLong(3) == 7L)
  }

  test("row-level semantics: a null value in the matched right row stays null") {
    val probes = Seq((1L, 10L, 1L)).toDF("k", "ts", "probe_id")
    val quotes = Seq[(Long, Long, java.lang.Long)](
      (1L, 5L, 99L), (1L, 9L, null)).toDF("k", "ts", "quote")
    // latest right row (ts=9) has quote=null → planned form emits null
    // (DuckDB ASOF semantics); the union form would carry 99 forward.
    val out = AsOfJoin.joinPlanned(probes, quotes, Seq("k"), "ts", "ts").collect()
    assert(out.length == 1 && out.head.isNullAt(3))
  }

  test("keys with no right rows, and right keys with no probes, behave") {
    val probes = Seq((1L, 10L, 1L), (2L, 10L, 2L)).toDF("k", "ts", "probe_id")
    val quotes = Seq((2L, 5L, 50L), (3L, 1L, 30L)).toDF("k", "ts", "quote")
    val out = AsOfJoin.joinPlanned(probes, quotes, Seq("k"), "ts", "ts")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(out == Set((1L, -1L), (2L, 50L)))
  }

  test("co-partitioned inputs plan with zero extra exchanges") {
    val probes = (1 to 400).map(i => ((i % 12).toLong, (i * 37 % 1000).toLong, i.toLong))
      .toDF("k", "ts", "probe_id")
    // unique (k, ts) by construction — no dedup aggregate muddying the plan
    val quotes = (1 to 300).map(i => ((i % 14).toLong, (i * 14 + i % 14).toLong, i * 10L))
      .toDF("k", "ts", "quote")
    val p = probes.repartition(4, col("k"))
    val q = quotes.repartition(4, col("k"))
    val joined = AsOfJoin.joinPlanned(p, q, Seq("k"), "ts", "ts")
    val plan = joined.queryExecution.executedPlan.toString
    // the two explicit repartitions are the ONLY exchanges: none was
    // inserted above them to satisfy the as-of operator itself
    assert(plan.contains("AsOfJoin"), plan)
    assert("ENSURE_REQUIREMENTS".r.findAllIn(plan).isEmpty,
      s"expected no requirement-inserted exchange:\n$plan")
    assert("REPARTITION_BY_NUM|REPARTITION_BY_COL".r.findAllIn(plan).size == 2, plan)
    // and the result is still right
    val want = AsOfJoin.join(probes, quotes, Seq("k"), "ts", "ts")
      .select("probe_id", "quote")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val got = joined.select("probe_id", "quote")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(got == want)
  }

  test("bucketed catalog tables as-of join with ZERO exchanges end-to-end") {
    val probes = (1 to 400).map(i => ((i % 12).toLong, (i * 37 % 1000).toLong, i.toLong))
      .toDF("k", "ts", "probe_id")
    val quotes = (1 to 300).map(i => ((i % 14).toLong, (i * 14 + i % 14).toLong, i * 10L))
      .toDF("k", "ts", "quote")
    spark.sql("DROP TABLE IF EXISTS asof_probes_b")
    spark.sql("DROP TABLE IF EXISTS asof_quotes_b")
    probes.write.bucketBy(4, "k").sortBy("k", "ts").saveAsTable("asof_probes_b")
    quotes.write.bucketBy(4, "k").sortBy("k", "ts").saveAsTable("asof_quotes_b")
    try {
      val joined = AsOfJoin.joinPlanned(
        spark.table("asof_probes_b"), spark.table("asof_quotes_b"),
        Seq("k"), "ts", "ts")
      val plan = joined.queryExecution.executedPlan.toString
      // the 100 TB story: bucketed layout + declared requirements ⇒ the
      // as-of join is a pure merge over the scans — no exchange at all
      assert(plan.contains("AsOfJoin"), plan)
      assert(!plan.contains("Exchange"), s"expected a zero-exchange plan:\n$plan")
      val want = AsOfJoin.join(probes, quotes, Seq("k"), "ts", "ts")
        .select("probe_id", "quote")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      val got = joined.select("probe_id", "quote")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(got == want)
    } finally {
      spark.sql("DROP TABLE IF EXISTS asof_probes_b")
      spark.sql("DROP TABLE IF EXISTS asof_quotes_b")
    }
  }

  test("multi-key as-of matches the union+window form") {
    val rnd = new scala.util.Random(11)
    val probes = (1 to 300).map(i =>
      (rnd.nextInt(5).toLong, s"g${rnd.nextInt(3)}", rnd.nextInt(500).toLong, i.toLong))
      .toDF("k1", "k2", "ts", "probe_id")
    val quotes = (1 to 200).map(i =>
      (rnd.nextInt(6).toLong, s"g${rnd.nextInt(3)}", rnd.nextInt(500).toLong, i * 10L))
      .toDF("k1", "k2", "ts", "quote")
      .groupBy("k1", "k2", "ts").agg(max("quote").as("quote"))
    val got = AsOfJoin.joinPlanned(probes, quotes, Seq("k1", "k2"), "ts", "ts")
      .select("probe_id", "quote")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val want = AsOfJoin.join(probes, quotes, Seq("k1", "k2"), "ts", "ts")
      .select("probe_id", "quote")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(got == want)
  }

  test("null join keys group together (the window form's partitioning semantics)") {
    val probes = Seq[(java.lang.Long, Long, Long)]((null, 10L, 1L), (1L, 10L, 2L))
      .toDF("k", "ts", "probe_id")
    val quotes = Seq[(java.lang.Long, Long, Long)]((null, 5L, 77L), (1L, 5L, 88L))
      .toDF("k", "ts", "quote")
    val got = AsOfJoin.joinPlanned(probes, quotes, Seq("k"), "ts", "ts")
      .select("probe_id", "quote")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val want = AsOfJoin.join(probes, quotes, Seq("k"), "ts", "ts")
      .select("probe_id", "quote")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(got == want)
    assert(got == Set((1L, 77L), (2L, 88L))) // null-key probe sees null-key quote
  }

  test("un-partitioned inputs get exchanges from EnsureRequirements and stay correct") {
    val (probes, quotes) = randomSides(9)
    val joined = AsOfJoin.joinPlanned(probes.coalesce(1), quotes.coalesce(3),
      Seq("k"), "ts", "ts")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("ENSURE_REQUIREMENTS"), plan)
    assert(joined.count() == 400)
  }
}
