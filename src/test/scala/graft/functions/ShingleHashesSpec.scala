package graft.functions

import graft.SparkSpec

class ShingleHashesSpec extends SparkSpec {
  import spark.implicits._

  test("matches the split/concat_ws/xxhash64 pipeline bit-for-bit") {
    graft.sql.GraftExtensions.ensureRegistered(spark)
    val df = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "  leading   and trailing   spaces\tand\ttabs\nhere today "),
      (3L, "one two three"),
      (4L, "dup dup dup dup dup"),          // repeated shingles → dedup
      (5L, "too few"),                      // < n words → empty
      (6L, "\tleading tab then words here"), // trim() would keep the \t
      (7L, "verticaltab is whitespace too")
    ).toDF("id", "text")
    val both = df
      .selectExpr("id", "text",
        "filter(split(text, '\\\\s+'), x -> x <> '') AS w")
      .selectExpr("id",
        "sort_array(shingle_hashes(text, 3)) AS fast",
        """sort_array(array_distinct(CASE WHEN size(w) >= 3
          | THEN transform(sequence(1, size(w) - 2),
          |   i -> xxhash64(concat_ws(' ',
          |     element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
          | ELSE array() END)) AS slow""".stripMargin)
    assert(both.filter("fast <> slow").count() == 0)
    val empty = both.filter("id = 5").selectExpr("size(fast)").head().getInt(0)
    assert(empty == 0)
  }

  test("null text yields null (not a crash)") {
    graft.sql.GraftExtensions.ensureRegistered(spark)
    val r = spark.sql("SELECT shingle_hashes(CAST(NULL AS string), 3)").head()
    assert(r.isNullAt(0))
  }
}
