package graft.engine

import graft.SparkSpec

class LineageSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("lineage tracks columns through CTEs, windows, and alias chains") {
    spark.read.parquet(s"$dir/orders.parquet").createOrReplaceTempView("orders")
    spark.read.parquet(s"$dir/customer.parquet").createOrReplaceTempView("customer")
    val df = spark.sql(
      """WITH big AS (
        |  SELECT o_custkey AS ck, o_totalprice AS tp FROM orders
        |  WHERE o_totalprice > 1000
        |)
        |SELECT c.c_name AS who,
        |       rank() OVER (ORDER BY b.tp) AS rnk,
        |       b.tp * 2 AS double_price
        |FROM big b JOIN customer c ON b.ck = c.c_custkey""".stripMargin)
    val got = Lineage.columnLineage(df).toSet
    assert(got == Set(
      ("double_price", "orders", "o_totalprice"),
      ("rnk", "orders", "o_totalprice"),
      ("who", "customer", "c_name")))
  }

  test("lineage survives a UNION and dedups repeated contributions") {
    spark.read.parquet(s"$dir/nation.parquet").createOrReplaceTempView("nation")
    val df = spark.sql(
      """SELECT n_name AS x FROM nation
        |UNION ALL
        |SELECT upper(n_name) FROM nation""".stripMargin)
    assert(Lineage.columnLineage(df) == Seq(("x", "nation", "n_name")))
  }

  test("union lineage includes DISTINCT sources from later branches") {
    // the pass-through regression: Union's output reuses branch 1's
    // exprIds, so branch 2's distinct source column must still appear
    spark.read.parquet(s"$dir/nation.parquet").createOrReplaceTempView("nation")
    spark.read.parquet(s"$dir/region.parquet").createOrReplaceTempView("region")
    val df = spark.sql(
      """SELECT n_name AS nm, n_nationkey AS k FROM nation
        |UNION ALL
        |SELECT r_name, r_regionkey + 100 FROM region""".stripMargin)
    assert(Lineage.columnLineage(df).toSet == Set(
      ("nm", "nation", "n_name"),
      ("nm", "region", "r_name"),
      ("k", "nation", "n_nationkey"),
      ("k", "region", "r_regionkey")))
  }
}
