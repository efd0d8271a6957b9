package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    ("k1", 10L, "l-a"), ("k1", 20L, "l-b"), ("k1", 5L, "l-early"),
    ("k2", 10L, "l-c"), ("k3", 10L, "l-nomatch")
  ).toDF("key", "ts", "lval")

  private def right = Seq(
    ("k1", 10L, "r-at10"), ("k1", 15L, "r-at15"), ("k2", 9L, "r-at9")
  ).toDF("key", "ts", "rval")

  private def result: Map[(String, Long), Option[String]] =
    AsOfJoin(left, right, Seq("key"), "ts").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> Option(r.getAs[String]("rval"))).toMap

  test("matches latest right row at-or-before left ts") {
    assert(result(("k1", 20L)).contains("r-at15"))
    assert(result(("k2", 10L)).contains("r-at9"))
  }

  test("tie at equal timestamp matches (>= semantics)") {
    assert(result(("k1", 10L)).contains("r-at10"))
  }

  test("no earlier right row → null, row preserved") {
    assert(result(("k1", 5L)).isEmpty)
    assert(result(("k3", 10L)).isEmpty)
    assert(result.size == 5) // every left row survives exactly once
  }

  test("column collision is rejected with a named error") {
    val clash = right.withColumnRenamed("rval", "lval")
    val e = intercept[IllegalArgumentException](
      AsOfJoin(left, clash, Seq("key"), "ts"))
    assert(e.getMessage.contains("lval"))
  }
}
