package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** [[TopKBy]] / [[graft.operators.TopK]]: bounded-heap top-k per key.
  * Covers the aggregate through the full two-phase path (partial →
  * exchange → final), the serialize/merge hop forced by many input
  * partitions, ascending mode, null-ord skipping, string payloads, the
  * SQL registration, and agreement with the window-row_number oracle
  * form. */
class TopKBySpec extends SparkSpec {
  import spark.implicits._

  test("top-k per key matches the window form on a deterministic total order") {
    val df = (1 to 500).map(i => (i % 7, i * 31 % 101, i)).toDF("key", "score", "id")
      .repartition(13) // force many partial buffers + serialize/merge
    val got = graft.operators.TopK
      .perKey(df, Seq("key"), Seq(col("score"), col("id")), k = 4)
      .select("key", "score", "id")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key").orderBy(col("score").desc, col("id").desc)
    val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
      .select("key", "score", "id")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == want)
  }

  test("groups smaller than k return all their rows, ordered best-first") {
    val df = Seq((1, 10L, "a"), (1, 30L, "b"), (2, 5L, "c")).toDF("k", "s", "v")
    graft.sql.GraftExtensions.ensureRegistered(spark)
    val out = df.groupBy("k")
      .agg(call_function("top_k_by", col("s"), col("v"), lit(5)).as("t"))
      .select(col("k"), col("t.ord").as("ords"), col("t.item").as("items"))
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1), r.getSeq[String](2)))
      .sortBy(_._1)
    assert(out(0) == ((1, Seq(30L, 10L), Seq("b", "a"))))
    assert(out(1) == ((2, Seq(5L), Seq("c"))))
  }

  test("ascending direction keeps the smallest k") {
    val df = (1 to 100).map(i => (i % 3, i.toLong)).toDF("k", "s")
    graft.sql.GraftExtensions.ensureRegistered(spark)
    val out = df.groupBy("k")
      .agg(call_function("top_k_by", col("s"), col("s"), lit(2), lit("asc")).as("t"))
      .select(col("k"), col("t.ord").as("ords"))
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1))).toMap
    assert(out(0) == Seq(3L, 6L))  // smallest two, best (smallest) first
    assert(out(1) == Seq(1L, 4L))
    assert(out(2) == Seq(2L, 5L))
  }

  test("null ord rows are skipped; null payloads survive") {
    val df = Seq[(Int, java.lang.Long, String)](
      (1, 9L, null), (1, null, "dropped"), (1, 3L, "x"))
      .toDF("k", "s", "v")
    graft.sql.GraftExtensions.ensureRegistered(spark)
    val out = df.groupBy("k")
      .agg(call_function("top_k_by", col("s"), col("v"), lit(10)).as("t"))
      .select(col("t.ord").as("ords"), col("t.item").as("items"))
      .head()
    assert(out.getSeq[Long](0) == Seq(9L, 3L))
    assert(out.getSeq[String](1) == Seq(null, "x"))
  }

  test("SQL text form works (struct ord, struct payload)") {
    graft.sql.GraftExtensions.ensureRegistered(spark)
    (1 to 50).map(i => (i % 2, i, s"row$i")).toDF("k", "n", "tag")
      .createOrReplaceTempView("topk_in")
    val rows = spark.sql(
      """SELECT k, x.item.n AS n, x.item.tag AS tag
        |FROM (SELECT k, explode(top_k_by(struct(n, tag), struct(n, tag), 2)) AS x
        |      FROM topk_in GROUP BY k)""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    assert(rows == Set((0, 50, "row50"), (0, 48, "row48"),
      (1, 49, "row49"), (1, 47, "row47")))
  }

  test("plan: partial top_k_by runs map-side (ObjectHashAggregate two-phase)") {
    val df = (1 to 100).map(i => (i % 5, i)).toDF("k", "n").repartition(7)
    val out = graft.operators.TopK.perKey(df, Seq("k"), Seq(col("n")), k = 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate in:\n$plan")
    assert(plan.contains("partial_top_k_by") || plan.contains("partial top_k_by"),
      s"expected a partial (map-side) top_k_by phase in:\n$plan")
  }
}
