package graft.sql

import graft.SparkSpec

class GuardWindowSpec extends SparkSpec {
  import spark.implicits._

  private def globalWindowQuery() =
    Seq((1, "a"), (2, "b")).toDF("n", "s")
      .selectExpr("n", "row_number() OVER (ORDER BY n) AS rn")

  test("fail-fast mode rejects unpartitioned ordered windows") {
    spark.conf.set("spark.graft.failOnGlobalWindow", "true")
    try {
      val e = intercept[graft.config.ConfigError](globalWindowQuery().collect())
      assert(e.getMessage.contains("PARTITION BY"))
      assert(e.getMessage.contains("GlobalSort"))
    } finally spark.conf.set("spark.graft.failOnGlobalWindow", "false")
  }

  test("default mode only warns — the query still runs") {
    assert(globalWindowQuery().collect().map(_.getInt(1)).sorted.toSeq == Seq(1, 2))
  }

  test("partitioned windows pass untouched in fail-fast mode") {
    spark.conf.set("spark.graft.failOnGlobalWindow", "true")
    try {
      val ok = Seq((1, "a"), (2, "a")).toDF("n", "g")
        .selectExpr("n", "row_number() OVER (PARTITION BY g ORDER BY n) AS rn")
        .collect()
      assert(ok.length == 2)
    } finally spark.conf.set("spark.graft.failOnGlobalWindow", "false")
  }
}
