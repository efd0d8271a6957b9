package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChoiceResolverSpec extends SparkSpec {
  import spark.implicits._

  // one row per drift shape: number, plain string, NUMERIC string,
  // json null, field absent
  private def drifted = Seq(
    (1L, """{"v": 42}"""),
    (2L, """{"v": "click"}"""),
    (3L, """{"v": "12"}"""),
    (4L, """{"v": null}"""),
    (5L, """{}""")
  ).toDF("id", "j").select(col("id"), parse_json(col("j")).as("var"))

  test("make_cols splits by ACTUAL type: numeric strings stay strings") {
    val r = ChoiceResolver.makeCols(drifted, "var", "v", Seq("long", "string"))
      .select("id", "v_long", "v_string").collect()
      .map(x => x.getLong(0) -> ((Option(x.get(1)), Option(x.get(2))))).toMap
    assert(r(1L) == ((Some(42L), None)))
    assert(r(2L) == ((None, Some("click"))))
    assert(r(3L) == ((None, Some("12")))) // actual type, not castability
    assert(r(4L) == ((None, None)))
    assert(r(5L) == ((None, None)))
  }

  test("cast:long converts castable values and flags real conflicts only") {
    val r = ChoiceResolver.castTo(drifted, "var", "v", "long")
      .select("id", "v", "v_conflict").collect()
      .map(x => x.getLong(0) -> ((Option(x.get(1)), x.getBoolean(2)))).toMap
    assert(r(1L) == ((Some(42L), false)))
    assert(r(2L) == ((None, true)))      // present, unconvertible -> conflict
    assert(r(3L) == ((Some(12L), false))) // cast DOES parse numeric strings
    assert(r(4L) == ((None, false)))     // json null: no value to lose
    assert(r(5L) == ((None, false)))     // absent: no value to lose
  }

  test("project keeps the named actual type; make_struct carries all attempts") {
    val p = ChoiceResolver.project(drifted, "var", "v", "string")
      .select("id", "v").collect()
      .map(x => x.getLong(0) -> Option(x.get(1))).toMap
    assert(p(1L).isEmpty && p(2L) == Some("click") && p(3L) == Some("12"))
    val s = ChoiceResolver.makeStruct(drifted, "var", "v", Seq("long", "string"))
      .selectExpr("id", "v.long", "v.string").collect()
      .map(x => x.getLong(0) -> ((Option(x.get(1)), Option(x.get(2))))).toMap
    assert(s(1L) == ((Some(42L), None)))
    assert(s(2L) == ((None, Some("click"))))
  }

  test("spec parsing: glue spellings accepted, unknown specs named errors") {
    val viaSpec = ChoiceResolver.resolveChoice(drifted, "var", "v", "cast:long")
    assert(viaSpec.columns.contains("v_conflict"))
    val e1 = intercept[graft.config.ConfigError](
      ChoiceResolver.resolveChoice(drifted, "var", "v", "explode"))
    assert(e1.getMessage.contains("unknown spec"))
    val e2 = intercept[graft.config.ConfigError](
      ChoiceResolver.castTo(drifted, "var", "v", "decimal(9,2)"))
    assert(e2.getMessage.contains("unsupported type"))
  }
}
