package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The canonical TPC-H 22-query suite over the fixture star schema.
  *
  * The reference reaches ad-hoc analytics through its one `spark.sql`
  * dispatch (`glue/glue_etl_framework.py:60`); this suite proves the
  * engine handles the standard decision-support battery end-to-end,
  * DataFrame-first, each query value-oracled against DuckDB running the
  * canonical SQL form (correlated subqueries and EXISTS stay correlated
  * in the oracle — the Spark side's equality-keyed decorrelations are
  * cross-validated against them).
  *
  * == dbgen completion layer ==
  * The fixture is TPC-H-lite: `partsupp` and several dbgen columns
  * (l_commitdate/l_receiptdate/l_shipmode/l_shipinstruct, p_mfgr/
  * p_container, c_phone, o_shippriority) are absent. They are DERIVED
  * deterministically from the key columns — integer arithmetic only, the
  * same spirit as dbgen's own deterministic generation — with the
  * IDENTICAL derivation in the DuckDB oracle, so every query is still
  * value-hash-checked cross-engine. Derivations are pure projections
  * (zero shuffle): `partsupp` is part × explode(0..3), never a join.
  * The supplier cardinality (the suppkey modulus) is read once at
  * plan-build time — a single bounded aggregate on the dim side inlined
  * as a plan literal, so both engines derive identical rows.
  *
  * == declared parameter deviations (fixture domains, not semantics) ==
  *  - Q2: `p_size <= 15` (canonical `= 15`): the fixture's 6 p_type
  *    values make exact (type,size) cells empty at sf0.01.
  *  - Q8/Q14: `p_type = 'PROMO'` — fixture p_type is single-word.
  *  - Q9: `p_name LIKE '%red%'` over the fixture's adjective+noun names.
  *  - Q11: the share threshold is the scale-free `2× the mean per-part
  *    value` (canonical `0.0001/SF` hard-codes SF; same selectivity
  *    intent, survives any fixture scale).
  *  - Q13: the o_comment NOT-LIKE filter becomes `o_orderpriority <>
  *    '1-URGENT'` (no comment column; same "exclude a class of orders
  *    inside the LEFT JOIN condition" shape).
  *  - Q16: the s_comment complaints filter becomes `s_acctbal < 0`.
  *  - Q22: "no orders in 7 years" becomes "no orders since 1999-01-01"
  *    (the fixture's order history is 1995–2001).
  * Date constants are shifted into the fixture's 1995–2001 range.
  *
  * Numeric discipline follows the house rule (Relational.scala header):
  * money sums round(…,2), averages/ratios round(…,6), counts exact
  * BIGINT (DuckDB HUGEINT sums are CAST), ps_supplycost is exact integer
  * CENTS end-to-end.
  */
object TpcH {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  // ---- dbgen completion layer: Spark side ----

  /** partsupp: 4 suppliers per part via modular spread (dbgen's shape),
    * availqty/supplycost from key arithmetic. Pure projection of part. */
  private def partsupp(s: SparkSession, d: String): DataFrame = {
    // bounded plan-build aggregate: the dim cardinality becomes the
    // suppkey modulus literal (one long of driver traffic)
    val nSupp = t(s, d, "supplier").count()
    t(s, d, "part")
      .select(col("p_partkey"), explode(array((0 to 3).map(lit): _*)).as("i"))
      .select(
        col("p_partkey").as("ps_partkey"),
        expr(s"(p_partkey + i * ($nSupp div 4)) % $nSupp").cast("long").as("ps_suppkey"),
        expr("(p_partkey * 17 + i * 31) % 9999 + 1").cast("long").as("ps_availqty"))
      .withColumn("ps_supplycost_cents",
        expr("(ps_partkey * 7919 + ps_suppkey * 104729) % 100000 + 100").cast("long"))
  }

  /** The partsupp derivation as a DuckDB CTE (identical arithmetic). */
  private val PARTSUPP = """
    partsupp AS (
      SELECT p_partkey AS ps_partkey,
             CAST((p_partkey + i.i * (ns.n // 4)) % ns.n AS BIGINT) AS ps_suppkey,
             CAST((p_partkey * 17 + i.i * 31) % 9999 + 1 AS BIGINT) AS ps_availqty,
             CAST((p_partkey * 7919 + ((p_partkey + i.i * (ns.n // 4)) % ns.n) * 104729) % 100000 + 100 AS BIGINT) AS ps_supplycost_cents
      FROM part, (VALUES (0),(1),(2),(3)) i(i), (SELECT count(*) AS n FROM supplier) ns)"""

  /** lineitem + derived commit/receipt dates, shipmode, shipinstruct. */
  private def linex(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .withColumn("l_commitdate",
        expr("date_add(cast(l_shipdate as date), cast((l_orderkey * 3 + l_linenumber * 7) % 61 - 30 as int))"))
      .withColumn("l_receiptdate",
        expr("date_add(cast(l_shipdate as date), cast((l_orderkey * 5 + l_linenumber * 11) % 30 + 1 as int))"))
      .withColumn("l_shipmode",
        expr("element_at(array('REG AIR','AIR','RAIL','SHIP','TRUCK','MAIL','FOB'), cast((l_orderkey + l_linenumber * 3) % 7 + 1 as int))"))
      .withColumn("l_shipinstruct",
        expr("element_at(array('DELIVER IN PERSON','COLLECT COD','NONE','TAKE BACK RETURN'), cast((l_orderkey * 13 + l_linenumber) % 4 + 1 as int))"))

  private val LINEX = """
    linex AS (
      SELECT l.*,
             CAST(l_shipdate AS DATE) + CAST((l_orderkey * 3 + l_linenumber * 7) % 61 - 30 AS INT) AS l_commitdate,
             CAST(l_shipdate AS DATE) + CAST((l_orderkey * 5 + l_linenumber * 11) % 30 + 1 AS INT) AS l_receiptdate,
             (['REG AIR','AIR','RAIL','SHIP','TRUCK','MAIL','FOB'])[CAST((l_orderkey + l_linenumber * 3) % 7 + 1 AS INT)] AS l_shipmode,
             (['DELIVER IN PERSON','COLLECT COD','NONE','TAKE BACK RETURN'])[CAST((l_orderkey * 13 + l_linenumber) % 4 + 1 AS INT)] AS l_shipinstruct
      FROM lineitem l)"""

  /** part + derived p_mfgr and p_container. */
  private def partx(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .withColumn("p_mfgr", expr("concat('Manufacturer#', cast(p_partkey % 5 + 1 as string))"))
      .withColumn("p_container",
        expr("""concat(
          element_at(array('SM','MED','LG','JUMBO','WRAP'), cast((p_partkey % 40) div 8 + 1 as int)), ' ',
          element_at(array('CASE','BOX','BAG','PACK','PKG','JAR','DRUM','CAN'), cast(p_partkey % 8 + 1 as int)))"""))

  private val PARTX = """
    partx AS (
      SELECT p.*,
             'Manufacturer#' || CAST(p_partkey % 5 + 1 AS VARCHAR) AS p_mfgr,
             (['SM','MED','LG','JUMBO','WRAP'])[CAST((p_partkey % 40) // 8 + 1 AS INT)] || ' ' ||
             (['CASE','BOX','BAG','PACK','PKG','JAR','DRUM','CAN'])[CAST(p_partkey % 8 + 1 AS INT)] AS p_container
      FROM part p)"""

  /** customer + derived c_phone (country code = nationkey + 10). */
  private def custx(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .withColumn("c_phone",
        expr("""concat(cast(c_nationkey + 10 as string), '-',
                lpad(cast(c_custkey * 7 % 1000 as string), 3, '0'), '-',
                lpad(cast(c_custkey * 13 % 1000 as string), 3, '0'), '-',
                lpad(cast(c_custkey * 29 % 10000 as string), 4, '0'))"""))

  private val CUSTX = """
    custx AS (
      SELECT c.*,
             CAST(c_nationkey + 10 AS VARCHAR) || '-' ||
             lpad(CAST(c_custkey * 7 % 1000 AS VARCHAR), 3, '0') || '-' ||
             lpad(CAST(c_custkey * 13 % 1000 AS VARCHAR), 3, '0') || '-' ||
             lpad(CAST(c_custkey * 29 % 10000 AS VARCHAR), 4, '0') AS c_phone
      FROM customer c)"""

  private def revenue: Column = col("l_extendedprice") * (lit(1) - col("l_discount"))

  val all: Seq[(String, Q)] = Seq(

    // Q1 pricing summary report: full-scan aggregate, the classic
    // map-side-combine shape (6 groups — partial agg collapses 600k rows
    // to 6×32 before the exchange).
    "tpch01_pricing_summary" -> Q(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(revenue), 2).as("sum_disc_price"),
          round(sum(revenue * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(avg("l_extendedprice"), 6).as("avg_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order")),
      Some("""SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
             round(avg(l_quantity), 6) AS avg_qty,
             round(avg(l_extendedprice), 6) AS avg_price,
             round(avg(l_discount), 6) AS avg_disc,
             count(*) AS count_order
             FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02'
             GROUP BY l_returnflag, l_linestatus""")),

    // Q2 minimum-cost supplier: the min is per-part within the region —
    // a window over the equality-joined frame, not a correlated re-scan
    // (the oracle keeps dbgen's correlated form via the same window).
    "tpch02_min_cost_supp" -> Q(
      (s, d) => {
        val p = partx(s, d).filter(col("p_size") <= 15 && col("p_type") === "STANDARD")
        val joined = p.join(partsupp(s, d), col("p_partkey") === col("ps_partkey"))
          .join(t(s, d, "supplier"), col("ps_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "EUROPE")
        joined
          .withColumn("min_cost_cents",
            min("ps_supplycost_cents").over(Window.partitionBy("p_partkey")))
          .filter(col("ps_supplycost_cents") === col("min_cost_cents"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_mfgr"), col("min_cost_cents"))
          .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"), col("p_partkey"))
          .limit(100)
      },
      Some(s"""WITH $PARTSUPP
             SELECT s_acctbal, s_name, n_name, p_partkey, p_mfgr, min_cost_cents
             FROM (
               SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey,
                      'Manufacturer#' || CAST(p.p_partkey % 5 + 1 AS VARCHAR) AS p_mfgr,
                      ps.ps_supplycost_cents,
                      min(ps.ps_supplycost_cents) OVER (PARTITION BY p.p_partkey) AS min_cost_cents
               FROM part p
               JOIN partsupp ps ON p.p_partkey = ps.ps_partkey
               JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
               JOIN nation n ON s.s_nationkey = n.n_nationkey
               JOIN region r ON n.n_regionkey = r.r_regionkey
               WHERE p.p_size <= 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE') t
             WHERE ps_supplycost_cents = min_cost_cents
             ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
             LIMIT 100""")),

    // Q3 shipping priority: the LIMIT's sort key set is total
    // (l_orderkey is unique per group), so top-10 is deterministic.
    "tpch03_shipping_priority" -> Q(
      (s, d) => t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(revenue), 2).as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          col("o_orderdate").cast("date").as("o_orderdate"),
          lit(0).as("o_shippriority"))
        .orderBy(desc("revenue"), col("o_orderdate"), col("l_orderkey"))
        .limit(10),
      Some("""SELECT l_orderkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             CAST(o_orderdate AS DATE) AS o_orderdate, 0 AS o_shippriority
             FROM customer JOIN orders ON c_custkey = o_custkey
             JOIN lineitem ON l_orderkey = o_orderkey
             WHERE c_mktsegment = 'BUILDING'
               AND o_orderdate < TIMESTAMP '1998-03-15'
               AND l_shipdate > TIMESTAMP '1998-03-15'
             GROUP BY l_orderkey, o_orderdate
             ORDER BY revenue DESC, o_orderdate, l_orderkey
             LIMIT 10""")),

    // Q4 order priority checking: EXISTS → left-semi join (the oracle
    // keeps the correlated EXISTS — cross-validates the decorrelation).
    "tpch04_order_priority" -> Q(
      (s, d) => {
        val late = linex(s, d).filter(col("l_commitdate") < col("l_receiptdate"))
        t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp")
            && col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
          .join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
      },
      Some(s"""WITH $LINEX
             SELECT o_orderpriority, count(*) AS order_count
             FROM orders
             WHERE o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1997-10-01'
               AND EXISTS (SELECT 1 FROM linex WHERE l_orderkey = o_orderkey
                           AND l_commitdate < l_receiptdate)
             GROUP BY o_orderpriority""")),

    // Q5 local supplier volume: the classic 6-way snowflake — facts
    // shuffle on their join keys, dims broadcast.
    "tpch05_local_supplier" -> Q(
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, d, "supplier"),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(round(sum(revenue), 2).as("revenue")),
      Some("""SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             FROM customer JOIN orders ON c_custkey = o_custkey
             JOIN lineitem ON l_orderkey = o_orderkey
             JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             JOIN nation ON s_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             WHERE r_name = 'ASIA'
               AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
             GROUP BY n_name""")),

    // Q6 forecast revenue change: pure scan+filter+agg — the predicate
    // must reach the parquet scan (PushedFilters), zero joins.
    "tpch06_forecast_revenue" -> Q(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp")
          && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue")),
      Some("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
               AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""")),

    // Q7 volume shipping between two nations, by year.
    "tpch07_volume_shipping" -> Q(
      (s, d) => {
        val n1 = broadcast(t(s, d, "nation").select(
          col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation")))
        val n2 = broadcast(t(s, d, "nation").select(
          col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation")))
        t(s, d, "supplier")
          .join(t(s, d, "lineitem"), col("s_suppkey") === col("l_suppkey"))
          .filter(col("l_shipdate").between(
            lit("1997-01-01").cast("timestamp"), lit("1998-12-31").cast("timestamp")))
          .join(t(s, d, "orders"), col("o_orderkey") === col("l_orderkey"))
          .join(t(s, d, "customer"), col("c_custkey") === col("o_custkey"))
          .join(n1, col("s_nationkey") === col("n1_key"))
          .join(n2, col("c_nationkey") === col("n2_key"))
          .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
            || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .select(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("l_year"), revenue.as("volume"))
          .groupBy("supp_nation", "cust_nation", "l_year")
          .agg(round(sum("volume"), 2).as("revenue"))
      },
      Some("""SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
             FROM (
               SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                      CAST(year(l_shipdate) AS BIGINT) AS l_year,
                      l_extendedprice * (1 - l_discount) AS volume
               FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
               JOIN orders ON o_orderkey = l_orderkey
               JOIN customer ON c_custkey = o_custkey
               JOIN nation n1 ON s_nationkey = n1.n_nationkey
               JOIN nation n2 ON c_nationkey = n2.n_nationkey
               WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
                 AND l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1998-12-31'
             ) shipping
             GROUP BY supp_nation, cust_nation, l_year""")),

    // Q8 national market share: conditional share inside one grouped
    // aggregate — no second pass, no scalar join.
    "tpch08_market_share" -> Q(
      (s, d) => {
        val n2 = broadcast(t(s, d, "nation").select(
          col("n_nationkey").as("n2_key"), col("n_name").as("nation")))
        t(s, d, "part").filter(col("p_type") === "PROMO")
          .join(t(s, d, "lineitem"), col("p_partkey") === col("l_partkey"))
          .join(t(s, d, "supplier"), col("s_suppkey") === col("l_suppkey"))
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .filter(col("o_orderdate").between(
            lit("1997-01-01").cast("timestamp"), lit("1998-12-31").cast("timestamp")))
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "AMERICA")
          .join(n2, col("s_nationkey") === col("n2_key"))
          .select(year(col("o_orderdate")).cast("long").as("o_year"),
            revenue.as("volume"), col("nation"))
          .groupBy("o_year")
          .agg(round(
            sum(when(col("nation") === "NATION_3", col("volume")).otherwise(0)) / sum("volume"),
            6).as("mkt_share"))
      },
      Some("""SELECT o_year,
             round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) / sum(volume), 6) AS mkt_share
             FROM (
               SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                      l_extendedprice * (1 - l_discount) AS volume,
                      n2.n_name AS nation
               FROM part JOIN lineitem ON p_partkey = l_partkey
               JOIN supplier ON s_suppkey = l_suppkey
               JOIN orders ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               JOIN nation n1 ON c_nationkey = n1.n_nationkey
               JOIN region ON n1.n_regionkey = r_regionkey
               JOIN nation n2 ON s_nationkey = n2.n_nationkey
               WHERE r_name = 'AMERICA'
                 AND o_orderdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1998-12-31'
                 AND p_type = 'PROMO'
             ) all_nations
             GROUP BY o_year""")),

    // Q9 product-type profit: supplycost stays integer cents until the
    // per-row amount (exact integer mul, one float op per row).
    "tpch09_product_profit" -> Q(
      (s, d) => t(s, d, "part").filter(col("p_name").like("%red%"))
        .join(t(s, d, "lineitem"), col("p_partkey") === col("l_partkey"))
        .join(t(s, d, "supplier"), col("s_suppkey") === col("l_suppkey"))
        .join(partsupp(s, d),
          col("ps_suppkey") === col("l_suppkey") && col("ps_partkey") === col("l_partkey"))
        .join(t(s, d, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"),
          (revenue - col("ps_supplycost_cents") / 100.0 * col("l_quantity")).as("amount"))
        .groupBy("nation", "o_year")
        .agg(round(sum("amount"), 2).as("sum_profit")),
      Some(s"""WITH $PARTSUPP
             SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
             FROM (
               SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
                      l_extendedprice * (1 - l_discount)
                        - (ps_supplycost_cents / 100.0) * l_quantity AS amount
               FROM part JOIN lineitem ON p_partkey = l_partkey
               JOIN supplier ON s_suppkey = l_suppkey
               JOIN partsupp ON ps_suppkey = l_suppkey AND ps_partkey = l_partkey
               JOIN orders ON o_orderkey = l_orderkey
               JOIN nation ON s_nationkey = n_nationkey
               WHERE p_name LIKE '%red%'
             ) profit
             GROUP BY nation, o_year""")),

    // Q10 returned-item reporting: top 20 customers by lost revenue.
    "tpch10_returned_items" -> Q(
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") >= lit("1997-10-01").cast("timestamp")
          && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .join(t(s, d, "lineitem").filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(round(sum(revenue), 2).as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"), col("c_acctbal"), col("n_name"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(20),
      Some("""SELECT c_custkey, c_name,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             c_acctbal, n_name
             FROM customer JOIN orders ON c_custkey = o_custkey
             JOIN lineitem ON l_orderkey = o_orderkey
             JOIN nation ON c_nationkey = n_nationkey
             WHERE o_orderdate >= TIMESTAMP '1997-10-01' AND o_orderdate < TIMESTAMP '1998-01-01'
               AND l_returnflag = 'R'
             GROUP BY c_custkey, c_name, c_acctbal, n_name
             ORDER BY revenue DESC, c_custkey
             LIMIT 20""")),

    // Q11 important stock: the share threshold is a single-row total
    // broadcast (the documented scalar-normalizer plan shape) — scale-free
    // 2× the mean per-part value instead of the SF-hard-coded fraction.
    "tpch11_important_stock" -> Q(
      (s, d) => {
        val nParts = t(s, d, "part").count() // bounded plan-build aggregate
        val natPs = partsupp(s, d)
          .join(t(s, d, "supplier"), col("ps_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .filter(col("n_name") === "NATION_5")
          .select(col("ps_partkey"),
            (col("ps_supplycost_cents") * col("ps_availqty")).as("v"))
        val perPart = natPs.groupBy("ps_partkey").agg(sum("v").as("value_cents"))
        val thresh = natPs.agg((sum("v") * 2.0 / nParts).as("threshold"))
        perPart.crossJoin(broadcast(thresh))
          .filter(col("value_cents") > col("threshold"))
          .select("ps_partkey", "value_cents")
      },
      Some(s"""WITH $PARTSUPP
             SELECT ps_partkey, CAST(value_cents AS BIGINT) AS value_cents FROM (
               SELECT ps_partkey, sum(ps_supplycost_cents * ps_availqty) AS value_cents
               FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
               JOIN nation ON s_nationkey = n_nationkey
               WHERE n_name = 'NATION_5'
               GROUP BY ps_partkey) t
             WHERE value_cents > (
               SELECT sum(ps_supplycost_cents * ps_availqty) * 2.0 / (SELECT count(*) FROM part)
               FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
               JOIN nation ON s_nationkey = n_nationkey
               WHERE n_name = 'NATION_5')""")),

    // Q12 shipmode / order priority: derived shipmode + commit/receipt
    // discipline windows.
    "tpch12_shipmode_priority" -> Q(
      (s, d) => t(s, d, "orders")
        .join(linex(s, d)
          .filter(col("l_shipmode").isin("MAIL", "SHIP")
            && col("l_commitdate") < col("l_receiptdate")
            && col("l_shipdate").cast("date") < col("l_commitdate")
            && col("l_receiptdate") >= lit("1997-01-01").cast("date")
            && col("l_receiptdate") < lit("1998-01-01").cast("date")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_shipmode")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
            .cast("long").as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
            .cast("long").as("low_line_count")),
      Some(s"""WITH $LINEX
             SELECT l_shipmode,
             CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
                 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
                 THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             FROM orders JOIN linex ON o_orderkey = l_orderkey
             WHERE l_shipmode IN ('MAIL', 'SHIP')
               AND l_commitdate < l_receiptdate
               AND CAST(l_shipdate AS DATE) < l_commitdate
               AND l_receiptdate >= DATE '1997-01-01' AND l_receiptdate < DATE '1998-01-01'
             GROUP BY l_shipmode""")),

    // Q13 customer order-count distribution: the filter lives in the
    // LEFT JOIN's ON clause (customers with zero qualifying orders keep
    // c_count = 0 — count(col) counts non-null keys only).
    "tpch13_customer_distribution" -> Q(
      (s, d) => {
        val o = t(s, d, "orders")
        t(s, d, "customer")
          .join(o, col("c_custkey") === col("o_custkey")
            && col("o_orderpriority") =!= "1-URGENT", "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
      },
      Some("""SELECT c_count, count(*) AS custdist
             FROM (
               SELECT c_custkey, count(o_orderkey) AS c_count
               FROM customer LEFT OUTER JOIN orders
                 ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
               GROUP BY c_custkey
             ) c_orders
             GROUP BY c_count""")),

    // Q14 promotion effect: conditional revenue share over one month.
    "tpch14_promo_effect" -> Q(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .agg(round(
          lit(100.0) * sum(when(col("p_type") === "PROMO", revenue).otherwise(0)) / sum(revenue),
          6).as("promo_revenue")),
      Some("""SELECT round(100.00 * sum(CASE WHEN p_type = 'PROMO'
               THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
             FROM lineitem JOIN part ON l_partkey = p_partkey
             WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'""")),

    // Q15 top supplier: the max is joined back EQUALITY-keyed (broadcast
    // hash join on total_revenue = max) — no product in the plan.
    "tpch15_top_supplier" -> Q(
      (s, d) => {
        val revenue0 = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
          .groupBy(col("l_suppkey").as("supplier_no"))
          .agg(round(sum(revenue), 2).as("total_revenue"))
        val maxRev = revenue0.agg(max("total_revenue").as("max_revenue"))
        t(s, d, "supplier")
          .join(revenue0, col("s_suppkey") === col("supplier_no"))
          .join(broadcast(maxRev), col("total_revenue") === col("max_revenue"))
          .select("s_suppkey", "s_name", "total_revenue")
      },
      Some("""WITH revenue0 AS (
               SELECT l_suppkey AS supplier_no,
                      round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
               FROM lineitem
               WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
               GROUP BY l_suppkey)
             SELECT s_suppkey, s_name, total_revenue
             FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
             WHERE total_revenue = (SELECT max(total_revenue) FROM revenue0)""")),

    // Q16 parts/supplier relationship: NOT IN (no-null key) → anti join.
    "tpch16_parts_supplier" -> Q(
      (s, d) => {
        val complaints = t(s, d, "supplier").filter(col("s_acctbal") < 0)
          .select("s_suppkey")
        partsupp(s, d)
          .join(t(s, d, "part"), col("p_partkey") === col("ps_partkey"))
          .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO"
            && col("p_size").isin(1, 4, 7, 10, 15, 23, 45, 50))
          .join(broadcast(complaints), col("ps_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct("ps_suppkey").as("supplier_cnt"))
      },
      Some(s"""WITH $PARTSUPP
             SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
             FROM partsupp JOIN part ON p_partkey = ps_partkey
             WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
               AND p_size IN (1, 4, 7, 10, 15, 23, 45, 50)
               AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             GROUP BY p_brand, p_type, p_size""")),

    // Q17 small-quantity-order revenue: the correlated per-part average
    // decorrelates to a grouped agg join — lineitem is pre-filtered to
    // the (tiny) matching part set via a broadcast semi join BEFORE the
    // per-part aggregate, so the avg never computes for parts outside
    // the filter.
    "tpch17_small_qty_revenue" -> Q(
      (s, d) => {
        val keys = partx(s, d)
          .filter(col("p_brand") === "Brand#3" && col("p_container") === "MED BOX")
          .select("p_partkey")
        val li = t(s, d, "lineitem")
          .join(broadcast(keys), col("l_partkey") === col("p_partkey"), "left_semi")
        val perPart = li.groupBy(col("l_partkey").as("avg_partkey"))
          .agg((avg("l_quantity") * 0.5).as("half_avg_qty"))
        li.join(broadcast(perPart), col("l_partkey") === col("avg_partkey"))
          .filter(col("l_quantity") < col("half_avg_qty"))
          .agg(round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"))
      },
      Some(s"""WITH $PARTX
             SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
             FROM lineitem JOIN partx ON p_partkey = l_partkey
             WHERE p_brand = 'Brand#3' AND p_container = 'MED BOX'
               AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem
                                 WHERE l_partkey = p_partkey)""")),

    // Q18 large-volume customers: the IN subquery is a semi join on the
    // grouped-HAVING key set.
    "tpch18_large_volume" -> Q(
      (s, d) => {
        val big = t(s, d, "lineitem").groupBy("l_orderkey")
          .agg(sum("l_quantity").as("tot_qty"))
          .filter(col("tot_qty") > 300)
          .select(col("l_orderkey").as("big_orderkey"))
        t(s, d, "orders")
          .join(big, col("o_orderkey") === col("big_orderkey"), "left_semi")
          .join(t(s, d, "customer"), col("c_custkey") === col("o_custkey"))
          .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
          .agg(round(sum("l_quantity"), 2).as("sum_qty"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate").cast("date").as("o_orderdate"),
            col("o_totalprice"), col("sum_qty"))
          .orderBy(desc("o_totalprice"), col("o_orderdate"), col("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT c_name, c_custkey, o_orderkey,
             CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice,
             round(sum(l_quantity), 2) AS sum_qty
             FROM customer JOIN orders ON c_custkey = o_custkey
             JOIN lineitem ON o_orderkey = l_orderkey
             WHERE o_orderkey IN (
               SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
               HAVING sum(l_quantity) > 300)
             GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
             ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
             LIMIT 100""")),

    // Q19 discounted revenue: OR'd brand/container/quantity bands — the
    // join itself stays equality-keyed on partkey; the disjunction is a
    // post-join filter.
    "tpch19_discounted_revenue" -> Q(
      (s, d) => {
        val common = col("l_shipmode").isin("AIR", "REG AIR") &&
          col("l_shipinstruct") === "DELIVER IN PERSON"
        val band1 = col("p_brand") === "Brand#1" &&
          col("p_container").isin("SM CASE", "SM BOX", "SM PACK", "SM PKG") &&
          col("l_quantity").between(1, 11) && col("p_size").between(1, 5)
        val band2 = col("p_brand") === "Brand#2" &&
          col("p_container").isin("MED BAG", "MED BOX", "MED PKG", "MED PACK") &&
          col("l_quantity").between(10, 20) && col("p_size").between(1, 10)
        val band3 = col("p_brand") === "Brand#3" &&
          col("p_container").isin("LG CASE", "LG BOX", "LG PACK", "LG PKG") &&
          col("l_quantity").between(20, 30) && col("p_size").between(1, 15)
        linex(s, d)
          .join(partx(s, d), col("p_partkey") === col("l_partkey"))
          .filter(common && (band1 || band2 || band3))
          .agg(round(sum(revenue), 2).as("revenue"))
      },
      Some(s"""WITH $LINEX, $PARTX
             SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             FROM linex JOIN partx ON p_partkey = l_partkey
             WHERE l_shipmode IN ('AIR','REG AIR') AND l_shipinstruct = 'DELIVER IN PERSON'
               AND ((p_brand = 'Brand#1' AND p_container IN ('SM CASE','SM BOX','SM PACK','SM PKG')
                     AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
                 OR (p_brand = 'Brand#2' AND p_container IN ('MED BAG','MED BOX','MED PKG','MED PACK')
                     AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
                 OR (p_brand = 'Brand#3' AND p_container IN ('LG CASE','LG BOX','LG PACK','LG PKG')
                     AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15))""")),

    // Q20 potential part promotion: the correlated half-sum decorrelates
    // to a grouped agg on (partkey, suppkey); INNER join reproduces the
    // canonical NULL-comparison semantics (no lineitem rows → no match).
    "tpch20_potential_promotion" -> Q(
      (s, d) => {
        val redKeys = t(s, d, "part").filter(col("p_name").like("red%"))
          .select(col("p_partkey").as("red_partkey"))
        val liHalf = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .join(broadcast(redKeys), col("l_partkey") === col("red_partkey"), "left_semi")
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg((sum("l_quantity") * 0.5).as("half_qty"))
        val bigStock = partsupp(s, d)
          .join(broadcast(redKeys), col("ps_partkey") === col("red_partkey"), "left_semi")
          .join(liHalf,
            col("ps_partkey") === col("l_partkey") && col("ps_suppkey") === col("l_suppkey"))
          .filter(col("ps_availqty") > col("half_qty"))
          .select(col("ps_suppkey").as("stock_suppkey")).distinct()
        t(s, d, "supplier")
          .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .filter(col("n_name") === "NATION_7")
          .join(bigStock, col("s_suppkey") === col("stock_suppkey"), "left_semi")
          .select("s_name", "s_suppkey")
      },
      Some(s"""WITH $PARTSUPP
             SELECT s_name, s_suppkey
             FROM supplier JOIN nation ON s_nationkey = n_nationkey
             WHERE n_name = 'NATION_7'
               AND s_suppkey IN (
                 SELECT ps_suppkey FROM partsupp
                 WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
                   AND ps_availqty > (
                     SELECT 0.5 * sum(l_quantity) FROM lineitem
                     WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                       AND l_shipdate >= TIMESTAMP '1997-01-01'
                       AND l_shipdate < TIMESTAMP '1998-01-01'))""")),

    // Q21 suppliers who kept orders waiting: the EXISTS / NOT EXISTS
    // pair decorrelates to per-order supplier stats — l1's supplier is
    // the ONLY late one iff the order has ≥2 distinct suppliers and
    // exactly 1 distinct LATE supplier (and l1 itself is late).
    "tpch21_suppliers_waiting" -> Q(
      (s, d) => {
        val lx = linex(s, d)
        // two-level aggregate instead of a double countDistinct: the
        // per-(order,supplier) rollup is map-side combinable and avoids
        // the distinct-expand (which doubled the shuffle and read 7.9×
        // at 10× on the ScaleCheck generator; this shape reads ~linear)
        val stats = lx
          .groupBy(col("l_orderkey").as("st_orderkey"), col("l_suppkey").as("st_suppkey"))
          .agg(max(when(col("l_receiptdate") > col("l_commitdate"), 1).otherwise(0))
            .as("is_late"))
          .groupBy(col("st_orderkey"))
          .agg(count(lit(1)).as("n_supp"), sum(col("is_late")).as("n_late"))
          .filter(col("n_supp") >= 2 && col("n_late") === 1)
        lx.filter(col("l_receiptdate") > col("l_commitdate"))
          .join(stats, col("l_orderkey") === col("st_orderkey"))
          .join(t(s, d, "orders").filter(col("o_orderstatus") === "F"),
            col("o_orderkey") === col("l_orderkey"))
          .join(t(s, d, "supplier"), col("s_suppkey") === col("l_suppkey"))
          .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .filter(col("n_name") === "NATION_4")
          .groupBy("s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy(desc("numwait"), col("s_name"))
          .limit(100)
      },
      Some(s"""WITH $LINEX
             SELECT s_name, count(*) AS numwait
             FROM supplier JOIN linex l1 ON s_suppkey = l1.l_suppkey
             JOIN orders ON o_orderkey = l1.l_orderkey
             JOIN nation ON s_nationkey = n_nationkey
             WHERE o_orderstatus = 'F'
               AND l1.l_receiptdate > l1.l_commitdate
               AND EXISTS (SELECT 1 FROM linex l2 WHERE l2.l_orderkey = l1.l_orderkey
                           AND l2.l_suppkey <> l1.l_suppkey)
               AND NOT EXISTS (SELECT 1 FROM linex l3 WHERE l3.l_orderkey = l1.l_orderkey
                               AND l3.l_suppkey <> l1.l_suppkey
                               AND l3.l_receiptdate > l3.l_commitdate)
               AND n_name = 'NATION_4'
             GROUP BY s_name
             ORDER BY numwait DESC, s_name
             LIMIT 100""")),

    // Q22 global sales opportunity: country code from the derived phone;
    // the positive-balance average is a single-row broadcast (scalar
    // normalizer); NOT EXISTS → anti join on recent orders.
    "tpch22_sales_opportunity" -> Q(
      (s, d) => {
        val codes = Seq("13", "31", "23", "29", "30", "18", "17")
        val cust = custx(s, d)
          .withColumn("cntrycode", substring(col("c_phone"), 1, 2))
          .filter(col("cntrycode").isin(codes: _*))
        val avgBal = cust.filter(col("c_acctbal") > 0.0)
          .agg(avg("c_acctbal").as("avg_bal"))
        val recent = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
          .select("o_custkey")
        cust.crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("cntrycode")
          .agg(count(lit(1)).as("numcust"),
            round(sum("c_acctbal"), 2).as("totacctbal"))
      },
      Some(s"""WITH $CUSTX
             SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
             FROM (
               SELECT substring(c_phone, 1, 2) AS cntrycode, c_acctbal, c_custkey
               FROM custx
               WHERE substring(c_phone, 1, 2) IN ('13','31','23','29','30','18','17')) cs
             WHERE c_acctbal > (SELECT avg(c_acctbal) FROM custx
                                WHERE c_acctbal > 0.00
                                  AND substring(c_phone, 1, 2) IN ('13','31','23','29','30','18','17'))
               AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                               AND o_orderdate >= TIMESTAMP '1999-01-01')
             GROUP BY cntrycode"""))
  )
}
