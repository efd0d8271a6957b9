package graft.sql

import graft.SparkSpec

/** Round-7 Spark-4 SQL surfaces: VARIANT, pipe syntax, SQL UDFs.
  *
  * The oracles (q76–q78) pin VALUES; these pin the semantics and plan
  * claims the scaladocs make:
  *   - pipe syntax is pure surface: the |> spelling and the plain
  *     spelling optimize to the SAME logical plan;
  *   - a declarative SQL UDF inlines into the plan (no black-box
  *     ScalaUDF node survives optimization);
  *   - schema_of_variant reports the drifting per-row shapes that a
  *     static from_json schema could not absorb;
  *   - variant missing-path vs present-null are distinguishable.
  */
class Spark4SurfaceSpec extends SparkSpec {

  test("pipe syntax optimizes to the same plan as the plain spelling") {
    spark.sql("SELECT id AS k, id % 3 AS g, id * 2 AS v FROM range(100)")
      .createOrReplaceTempView("pipe_t")
    val piped = spark.sql(
      """FROM pipe_t
         |> WHERE k > 10
         |> AGGREGATE CAST(count(*) AS BIGINT) AS n, sum(v) AS sv GROUP BY g
         |> WHERE n > 1""")
    // NB deliberately the subquery spelling, not HAVING: HAVING plans a
    // THIRD aggregate expression (count re-computed, then projected
    // away) while the pipe form filters the aliased output directly —
    // the pipe plan is one node leaner than HAVING and identical to the
    // subquery form.
    val plain = spark.sql(
      """SELECT * FROM (
           SELECT g, CAST(count(*) AS BIGINT) AS n, sum(v) AS sv
           FROM pipe_t WHERE k > 10 GROUP BY g) WHERE n > 1""")
    assert(piped.queryExecution.optimizedPlan.canonicalized ==
           plain.queryExecution.optimizedPlan.canonicalized)
  }

  test("SQL scalar UDF inlines — no ScalaUDF node in the optimized plan") {
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION spec_cents(x DOUBLE)
                 RETURNS BIGINT RETURN CAST(floor(x * 100 + 0.5) AS BIGINT)""")
    val df = spark.sql("SELECT spec_cents(CAST(id AS DOUBLE)) AS c FROM range(10)")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"SQL UDF did not inline:\n$plan")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq ==
           (0 until 10).map(_ * 100L))
  }

  test("schema_of_variant reports per-row schema drift") {
    val rows = spark.sql(
      """SELECT schema_of_variant(parse_json(j)) AS sch FROM VALUES
           ('{"id":1,"cust":{"seg":"A"}}'),
           ('{"id":2,"tags":["a","b"]}'),
           ('{"id":3,"extra":null}') AS t(j)""")
      .collect().map(_.getString(0)).toSet
    assert(rows.size == 3, s"expected 3 distinct shapes, got $rows")
    assert(rows.exists(_.contains("ARRAY")), s"array shape missing: $rows")
    assert(rows.exists(_.contains("STRUCT")) || rows.exists(_.contains("OBJECT")),
           s"nested-object shape missing: $rows")
  }

  test("variant missing path vs present null are distinguishable") {
    val r = spark.sql(
      """SELECT variant_get(parse_json('{"a":null}'), '$.a') IS NULL AS present_null_is_sql_null,
                is_variant_null(variant_get(parse_json('{"a":null}'), '$.a')) AS present_null_flag,
                variant_get(parse_json('{"b":1}'), '$.a') IS NULL AS missing_is_sql_null,
                is_variant_null(variant_get(parse_json('{"b":1}'), '$.a')) AS missing_flag""")
      .collect().head
    // present-null: the variant value EXISTS (is_variant_null = true) but
    // is not a SQL NULL; missing: SQL NULL, is_variant_null = false.
    assert(!r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2) && !r.getBoolean(3))
  }
}
