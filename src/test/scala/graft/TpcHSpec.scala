package graft

import graft.queries.TpcH
import org.apache.spark.sql.Row

/** TPC-H suite sanity at sf0.001: every query constructs and runs; the
  * deterministic fixture pins exact values for the scan-heavy anchors
  * (independently computed in DuckDB). Full value-oracle coverage is the
  * driver's Verify gate at sf0.01/sf0.1 — this spec catches breakage at
  * commit time.
  */
class TpcHSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // sparse-at-sf0.001 result sets (empty by fixture size, non-empty at
  // the verify SFs — checked by tools/verify_all.sh at sf0.01/sf0.1)
  private val sparseAtSf0001 = Set("tpch07_volume_shipping",
    "tpch11_important_stock", "tpch20_potential_promotion",
    "tpch21_suppliers_waiting")

  test("all 22 queries run; non-sparse ones return rows at sf0.001") {
    val byName = TpcH.all.toMap
    assert(byName.size === 22)
    TpcH.all.foreach { case (name, q) =>
      val n = q.fn(spark, dir).count()
      if (!sparseAtSf0001(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("tpch01 pricing summary matches the pinned fixture values") {
    val rows = TpcH.all.toMap.apply("tpch01_pricing_summary")
      .fn(spark, dir)
      .selectExpr("l_returnflag", "l_linestatus", "count_order", "sum_qty")
      .orderBy("l_returnflag", "l_linestatus")
      .collect()
      .map { case Row(f: String, st: String, c: Long, q: Double) => (f, st, c, q) }
    assert(rows.toSeq === Seq(
      ("A", "F", 951L, 24153.0), ("A", "O", 960L, 23871.0),
      ("N", "F", 1044L, 27077.0), ("N", "O", 981L, 24968.0),
      ("R", "F", 947L, 23588.0), ("R", "O", 973L, 24892.0)))
  }

  test("tpch06 forecast revenue matches the pinned fixture value") {
    val rev = TpcH.all.toMap.apply("tpch06_forecast_revenue")
      .fn(spark, dir).collect().head.getDouble(0)
    assert(rev === 365888.56)
  }

  test("tpch05 snowflake matches the pinned fixture value") {
    val rows = TpcH.all.toMap.apply("tpch05_local_supplier")
      .fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.toSeq == Seq(("NATION_12", 49776.82)))
  }

  test("the completion layer derives identical partsupp keys at every scale") {
    // ps_suppkey must stay inside [0, |supplier|) and the 4 suppliers of
    // any part must be distinct — the modular-spread contract Q2/Q16/Q20
    // rely on for deterministic LIMIT ordering.
    val q16 = TpcH.all.toMap.apply("tpch16_parts_supplier").fn(spark, dir)
    val maxCnt = q16.agg(org.apache.spark.sql.functions.max("supplier_cnt"))
      .collect().head.getLong(0)
    assert(maxCnt <= 4 * 8, "supplier_cnt bounded by 4 suppliers × 8 sizes per cell")
  }
}
