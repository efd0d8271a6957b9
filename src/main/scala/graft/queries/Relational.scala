package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** One query definition: Spark implementation + optional DuckDB oracle.
  * Column names are aligned between both sides — the driver's compare
  * sorts columns by name before hashing. */
final case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String] = None)

/** The delegated-SQL correctness surface: one query per SURVEY.md §2B row
  * (B1–B33). The reference reaches all of these through its single
  * `spark.sql(SELECT)` dispatch (`glue/glue_etl_framework.py:60`); our
  * engine reaches them through the same Catalyst surface, expressed
  * DataFrame-first. Oracles are DuckDB-dialect SQL over the same parquet
  * tables (dialect drift handled per SURVEY §7 risk 5: same semantics,
  * per-dialect spelling).
  *
  * Numeric hygiene: double aggregates are `round`ed (sum→2dp, avg/corr→6dp)
  * on BOTH sides, because Spark and DuckDB accumulate floating point in
  * different orders; counts/keys stay exact integers. DuckDB `sum(int)`
  * returns HUGEINT and `ceil(double)` returns DOUBLE where Spark returns
  * BIGINT — oracles CAST to align.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Register all star-schema tables as temp views for SQL-text queries. */
  private def views(s: SparkSession, dir: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
      .foreach(n => t(s, dir, n).createOrReplaceTempView(n))

  val all: Seq[(String, Q)] = Seq(

    // B1 projection: select list, aliases, expression eval.
    // Per-row money is emitted as exact integer cents (floor(x*100+0.5)):
    // both engines do the identical IEEE ops, so no round()-implementation
    // drift at half-cent boundaries (round(,2) differed on 116/60k rows).
    "q01_project" -> Q(
      (s, d) => t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
          .cast("long").as("net_cents"),
        upper(col("l_returnflag")).as("flag")),
      Some("""SELECT l_orderkey, l_linenumber,
             CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT) AS net_cents,
             upper(l_returnflag) AS flag FROM lineitem""")),

    // B2 filter: comparison, AND/OR/NOT, IN, BETWEEN, LIKE, IS NULL
    "q02_filter" -> Q(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_quantity").between(10, 20)
          && col("l_returnflag").isin("A", "R")
          && col("l_shipdate") > lit("1995-06-01").cast("timestamp")
          && !col("l_linestatus").like("O%")
          && col("l_tax").isNotNull)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag IN ('A','R')
             AND l_shipdate > TIMESTAMP '1995-06-01'
             AND l_linestatus NOT LIKE 'O%' AND l_tax IS NOT NULL""")),

    // B3 inner equi-join, n-way (README Example-1 shape: revenue rollup
    // across the join graph). Dims are explicitly broadcast — at 100 TB
    // region/nation stay KB-sized while lineitem/orders shuffle on key.
    "q03_join_inner" -> Q(
      (s, d) => {
        val li = t(s, d, "lineitem"); val o = t(s, d, "orders")
        val c = t(s, d, "customer"); val n = t(s, d, "nation"); val r = t(s, d, "region")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
               count(lit(1)).as("n_items"))
      },
      Some("""SELECT r_name,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
             count(*) AS n_items
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             GROUP BY r_name""")),

    // B4 left outer join: unmatched left rows null-padded
    "q04_join_left" -> Q(
      (s, d) => {
        val c = t(s, d, "customer")
        val big = t(s, d, "orders").filter(col("o_totalprice") > 400000)
        c.join(big, c("c_custkey") === big("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_big"),
               round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("spend"))
      },
      Some("""SELECT c_custkey, count(o_orderkey) AS n_big,
             round(coalesce(sum(o_totalprice), 0.0), 2) AS spend
             FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
             ON c_custkey = o_custkey GROUP BY c_custkey""")),

    // B4 full outer join: unmatched rows on both sides
    "q04b_join_full" -> Q(
      (s, d) => {
        val cs = t(s, d, "customer").filter(col("c_nationkey") < 10)
          .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
        val sp = t(s, d, "supplier").filter(col("s_nationkey") > 5)
          .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
        cs.join(sp, cs("c_nationkey") === sp("s_nationkey"), "full")
          .select(coalesce(cs("c_nationkey"), sp("s_nationkey")).as("nk"),
                  coalesce(col("n_cust"), lit(0L)).as("n_cust"),
                  coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      },
      Some("""SELECT coalesce(c.k, s.k) AS nk,
             coalesce(c.n_cust, 0) AS n_cust, coalesce(s.n_supp, 0) AS n_supp FROM
             (SELECT c_nationkey AS k, CAST(count(*) AS BIGINT) AS n_cust FROM customer WHERE c_nationkey < 10 GROUP BY 1) c
             FULL JOIN
             (SELECT s_nationkey AS k, CAST(count(*) AS BIGINT) AS n_supp FROM supplier WHERE s_nationkey > 5 GROUP BY 1) s
             ON c.k = s.k""")),

    // B5 cross join (cartesian)
    "q05_cross_join" -> Q(
      (s, d) => t(s, d, "region").crossJoin(t(s, d, "nation"))
        .select(col("r_name"), col("n_name")),
      Some("SELECT r_name, n_name FROM region CROSS JOIN nation")),

    // B6 semi/anti join: EXISTS and NOT EXISTS
    "q06_semi_anti" -> Q(
      (s, d) => {
        val c = t(s, d, "customer"); val o = t(s, d, "orders")
        val finished = o.filter(col("o_orderstatus") === "F")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .join(finished, col("c_custkey") === finished("o_custkey"), "left_anti")
          .select(col("c_custkey"))
      },
      Some("""SELECT c_custkey FROM customer c
             WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderstatus = 'F')""")),

    // B6b NOT IN three-valued-logic trap: a NULL in the subquery makes
    // NOT IN yield UNKNOWN for every row (0 matches), while the
    // NOT-EXISTS spelling of "no such order" keeps matching — the
    // classic semantic difference, asserted as exact counts.
    "q06b_not_in_nulls" -> Q(
      (s, d) => {
        views(s, d)
        s.sql(
          """SELECT
            |  CAST((SELECT count(*) FROM customer WHERE c_custkey NOT IN
            |    (SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL ELSE o_custkey END
            |     FROM orders WHERE o_custkey <= 700)) AS BIGINT) AS n_not_in_with_null,
            |  CAST((SELECT count(*) FROM customer WHERE c_custkey NOT IN
            |    (SELECT o_custkey FROM orders WHERE o_custkey <= 700)) AS BIGINT) AS n_not_in_clean,
            |  CAST((SELECT count(*) FROM customer c WHERE NOT EXISTS
            |    (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
            |     AND o.o_custkey <= 700)) AS BIGINT)
            |    AS n_not_exists""".stripMargin)
      },
      Some("""SELECT
             |  CAST((SELECT count(*) FROM customer WHERE c_custkey NOT IN
             |    (SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL ELSE o_custkey END
             |     FROM orders WHERE o_custkey <= 700)) AS BIGINT) AS n_not_in_with_null,
             |  CAST((SELECT count(*) FROM customer WHERE c_custkey NOT IN
             |    (SELECT o_custkey FROM orders WHERE o_custkey <= 700)) AS BIGINT) AS n_not_in_clean,
             |  CAST((SELECT count(*) FROM customer c WHERE NOT EXISTS
             |    (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
             |     AND o.o_custkey <= 700)) AS BIGINT)
             |    AS n_not_exists""".stripMargin)),

    // B7 theta join: equi key + inequality residual — the scalable shape
    // (hash/SMJ on the equi part, residual as post-join filter), not a
    // cartesian product.
    "q07_theta_join" -> Q(
      (s, d) => {
        val sup = t(s, d, "supplier"); val c = t(s, d, "customer")
        sup.join(c, sup("s_nationkey") === c("c_nationkey")
                    && sup("s_acctbal") < c("c_acctbal"))
          .groupBy(col("s_suppkey"))
          .agg(count(lit(1)).as("n_richer"), round(max(col("c_acctbal")), 2).as("max_bal"))
      },
      Some("""SELECT s_suppkey, count(*) AS n_richer, round(max(c_acctbal), 2) AS max_bal
             FROM supplier JOIN customer
             ON s_nationkey = c_nationkey AND s_acctbal < c_acctbal
             GROUP BY s_suppkey""")),

    // B8 as-of join (via graft.operators.AsOfJoin — union + running
    // last_value, one sort-shuffle, no range-join explosion; SURVEY B8).
    // For each click, the latest error at-or-before it for the same user.
    "q08_asof_join" -> Q(
      (s, d) => {
        val ev = t(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts"), col("value").as("err_value"))
        graft.operators.AsOfJoin.join(clicks, errors, Seq("user_id"), "ts", "ts")
          .select(col("event_id"), col("user_id"), col("err_value"))
      },
      Some("""SELECT c.event_id, c.user_id, e.value AS err_value
             FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
             ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'error') e
             ON c.user_id = e.user_id AND c.ts >= e.ts""")),

    // B9 grouped aggregation (TPC-H Q1 shape) incl. count distinct,
    // stddev, corr, covar
    "q09_agg_groupby" -> Q(
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
             round(sum(col("l_extendedprice")), 2).as("sum_price"),
             round(avg(col("l_discount")), 6).as("avg_disc"),
             count(lit(1)).as("n_rows"),
             countDistinct(col("l_orderkey")).as("n_orders"),
             round(stddev(col("l_quantity")), 4).as("sd_qty"),
             round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp")),
      Some("""SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_price,
             round(avg(l_discount), 6) AS avg_disc,
             count(*) AS n_rows,
             CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
             round(stddev(l_quantity), 4) AS sd_qty,
             round(corr(l_quantity, l_extendedprice), 6) AS corr_qp
             FROM lineitem GROUP BY l_returnflag, l_linestatus""")),

    // B10 global aggregate (no GROUP BY)
    "q10_agg_global" -> Q(
      (s, d) => t(s, d, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        sum(col("l_quantity")).as("sum_qty"),
        round(min(col("l_extendedprice")), 2).as("min_price"),
        round(max(col("l_extendedprice")), 2).as("max_price")),
      Some("""SELECT count(*) AS n_rows,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
             sum(l_quantity) AS sum_qty,
             round(min(l_extendedprice), 2) AS min_price,
             round(max(l_extendedprice), 2) AS max_price FROM lineitem""")),

    // B11 ROLLUP (multi-grouping via Catalyst Expand) + grouping()
    "q11_rollup" -> Q(
      (s, d) => {
        val c = t(s, d, "customer"); val n = t(s, d, "nation"); val r = t(s, d, "region")
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(round(sum(col("c_acctbal")), 2).as("bal"),
               count(lit(1)).as("n"),
               grouping(col("n_name")).cast("int").as("g_nation"))
      },
      Some("""SELECT r_name, n_name, round(sum(c_acctbal), 2) AS bal, count(*) AS n,
             CAST(GROUPING(n_name) AS INT) AS g_nation
             FROM customer JOIN nation ON c_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             GROUP BY ROLLUP (r_name, n_name)""")),

    // B11b CUBE + explicit GROUPING SETS with grouping_id — the Expand
    // shapes beyond ROLLUP (q11)
    "q11b_cube_sets" -> Q(
      (s, d) => {
        views(s, d)
        s.sql(
          """SELECT l_returnflag, l_linestatus,
            |       CAST(grouping(l_returnflag) AS INT) AS g_flag,
            |       CAST(grouping(l_linestatus) AS INT) AS g_status,
            |       CAST(count(*) AS BIGINT) AS n,
            |       CAST(sum(floor(l_extendedprice * 100 + 0.5)) AS BIGINT) AS cents
            |FROM lineitem
            |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
            |                        (l_returnflag), (l_linestatus), ())""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(grouping(l_returnflag) AS INT) AS g_flag,
             |       CAST(grouping(l_linestatus) AS INT) AS g_status,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(floor(l_extendedprice * 100 + 0.5)) AS BIGINT) AS cents
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
             |                        (l_returnflag), (l_linestatus), ())""".stripMargin)),

    // B12 HAVING (post-aggregation filter)
    "q12_having" -> Q(
      (s, d) => t(s, d, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("spend"))
        .filter(col("n_orders") > 5),
      Some("""SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
             FROM orders GROUP BY o_custkey HAVING count(*) > 5""")),

    // B13 DISTINCT
    "q13_distinct" -> Q(
      (s, d) => t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"), col("l_suppkey")).distinct(),
      Some("SELECT DISTINCT l_returnflag, l_linestatus, l_suppkey FROM lineitem")),

    // B14 exact count distinct (oracle-checked); the approx variant is
    // q14b below (HLL++ is engine-specific → rows-only check).
    "q14_count_distinct" -> Q(
      (s, d) => t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             countDistinct(col("l_orderkey"), col("l_linenumber")).as("n_lines")),
      Some("""SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
             CAST(count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS n_lines
             FROM lineitem GROUP BY l_returnflag""")),

    // B14 approx_count_distinct (HLL++) — no cross-engine oracle; bounds
    // asserted in ScalaTest instead.
    "q14b_approx_distinct" -> Q(
      (s, d) => t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("apx_parts"))),

    // B15 ranking window functions (row_number/rank/dense_rank/ntile/
    // percent_rank); deterministic ORDER BY tiebreak on the key.
    "q15_window_rank" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        t(s, d, "orders")
          .withColumn("rn", row_number().over(w))
          .withColumn("rnk", rank().over(w))
          .withColumn("drnk", dense_rank().over(w))
          .withColumn("nt", ntile(4).over(w))
          .withColumn("pr", round(percent_rank().over(w), 6))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("rn"), col("rnk"),
                  col("drnk"), col("nt"), col("pr"))
      },
      Some("""SELECT o_custkey, o_orderkey, rn, rnk, drnk, nt, pr FROM (
             SELECT o_custkey, o_orderkey,
             row_number() OVER w AS rn, rank() OVER w AS rnk,
             dense_rank() OVER w AS drnk, ntile(4) OVER w AS nt,
             round(percent_rank() OVER w, 6) AS pr
             FROM orders
             WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
             ) WHERE rn <= 3""")),

    // B16 analytic window functions: lag/lead/first_value/last_value
    "q16_window_analytic" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "orders")
          .withColumn("prev_price", round(lag(col("o_totalprice"), 1).over(w), 2))
          .withColumn("next_price", round(lead(col("o_totalprice"), 1).over(w), 2))
          .withColumn("first_key", first(col("o_orderkey")).over(w))
          .withColumn("last_key", last(col("o_orderkey")).over(wFull))
          .select(col("o_custkey"), col("o_orderkey"), col("prev_price"),
                  col("next_price"), col("first_key"), col("last_key"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
             round(lead(o_totalprice, 1) OVER w, 2) AS next_price,
             first_value(o_orderkey) OVER w AS first_key,
             last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key
             FROM orders
             WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""")),

    // B17 window aggregates with explicit frames (running + moving)
    "q17_window_frame" -> Q(
      (s, d) => {
        // the synthetic fixture has duplicate (orderkey, linenumber) pairs
        // (118k at sf0.1), so value columns join the ORDER BY to make the
        // ROWS-frame order total — otherwise the 3-row moving sum is
        // genuinely ambiguous between engines
        val order = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc,
            col("l_extendedprice").asc, col("l_quantity").asc)
        t(s, d, "lineitem")
          .withColumn("running_qty",
            sum(col("l_quantity")).over(order.rowsBetween(Window.unboundedPreceding, 0)))
          // moving SUM in exact cents, not round(avg,2): a 2dp-sum is an
          // exact cent multiple, so floor(x*100+0.5) is stable; avg/3 can
          // land exactly on half-cents where round() implementations drift.
          .withColumn("mov_cents",
            floor(sum(col("l_extendedprice")).over(order.rowsBetween(-2, 0)) * 100 + 0.5)
              .cast("long"))
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
                  col("running_qty"), col("mov_cents"))
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
             sum(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC, l_extendedprice ASC, l_quantity ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty,
             CAST(floor(sum(l_extendedprice) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC, l_extendedprice ASC, l_quantity ASC
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 100 + 0.5) AS BIGINT) AS mov_cents
             FROM lineitem""")),

    // B18 global ORDER BY — verified via a global row_number so the total
    // order itself is hashed, not just the row set. Uses the scale-safe
    // GlobalSort operator (range-partitioned sort + parallel per-partition
    // numbering + broadcast offsets), NOT row_number over an unpartitioned
    // window, which would funnel every row through one task.
    "q18_orderby" -> Q(
      (s, d) => graft.operators.GlobalSort.withRowNumber(
          t(s, d, "customer"), "rn",
          col("c_acctbal").desc, col("c_custkey").asc)
        .select(col("rn"), col("c_custkey")),
      Some("""SELECT row_number() OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS rn,
             c_custkey FROM customer""")),

    // B19 top-k: ORDER BY + LIMIT → TakeOrderedAndProject
    "q19_limit_topk" -> Q(
      (s, d) => t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc).limit(10)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price")),
      Some("""SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
             ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""")),

    // B20 set operations: UNION / UNION ALL / INTERSECT / EXCEPT
    "q20_setops" -> Q(
      (s, d) => {
        val rich = t(s, d, "customer").filter(col("c_acctbal") > 9000)
          .select(col("c_nationkey").as("nk"))
        val supp = t(s, d, "supplier").select(col("s_nationkey").as("nk"))
        val both = rich.intersect(supp)
        rich.union(supp).distinct()
          .except(rich.except(supp))
          .unionAll(both)
      },
      Some("""WITH rich AS (SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000),
             supp AS (SELECT s_nationkey AS nk FROM supplier),
             u AS (SELECT DISTINCT nk FROM (SELECT nk FROM rich UNION SELECT nk FROM supp)),
             ex AS (SELECT nk FROM u EXCEPT (SELECT nk FROM rich EXCEPT SELECT nk FROM supp))
             SELECT nk FROM ex UNION ALL (SELECT nk FROM rich INTERSECT SELECT nk FROM supp)""")),

    // B21 CTEs + scalar subqueries (uncorrelated and correlated)
    "q21_cte_subquery" -> Q(
      (s, d) => { views(s, d); s.sql(
        """WITH nat_avg AS (
             SELECT c_nationkey, avg(c_acctbal) AS nav FROM customer GROUP BY c_nationkey)
           SELECT c.c_custkey, c.c_nationkey FROM customer c
           JOIN nat_avg a ON a.c_nationkey = c.c_nationkey
           WHERE c.c_acctbal > a.nav
             AND c.c_acctbal > (SELECT avg(c_acctbal) FROM customer)""") },
      Some("""WITH nat_avg AS (
             SELECT c_nationkey, avg(c_acctbal) AS nav FROM customer GROUP BY c_nationkey)
             SELECT c.c_custkey, c.c_nationkey FROM customer c
             JOIN nat_avg a ON a.c_nationkey = c.c_nationkey
             WHERE c.c_acctbal > a.nav
             AND c.c_acctbal > (SELECT avg(c_acctbal) FROM customer)""")),

    // B22 conditionals: CASE / COALESCE / NULLIF / GREATEST / LEAST
    "q22_case_when" -> Q(
      (s, d) => t(s, d, "orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000, "high")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("low").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status2"),
        round(greatest(col("o_totalprice"), lit(50000.0)), 2).as("floor_price"),
        least(col("o_custkey"), col("o_orderkey")).as("min_key")),
      Some("""SELECT o_orderkey,
             CASE WHEN o_totalprice > 300000 THEN 'high'
                  WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS bucket,
             coalesce(nullif(o_orderstatus, 'O'), 'open') AS status2,
             round(greatest(o_totalprice, 50000.0), 2) AS floor_price,
             least(o_custkey, o_orderkey) AS min_key FROM orders""")),

    // B23 casts & literals. Every numeric output is an integer-exact BIGINT/
    // INT: decimal and double casts are exercised mid-expression but never
    // surface as the result type, because decimal ("123.00" vs "123") and
    // double ("1.0" vs "1") stringify differently between Spark and DuckDB
    // in the driver's canonical hasher (SURVEY §7 risk 5; r2/r3 verdicts).
    "q23_cast" -> Q(
      (s, d) => t(s, d, "lineitem").select(
        col("l_orderkey").cast("string").as("key_str"),
        col("l_quantity").cast("int").as("qty_int"), // integer-valued double: exact
        col("l_shipdate").cast("date").as("ship_date"),
        round(col("l_extendedprice") * 100).cast("long").as("price_cents"),
        col("l_quantity").cast("decimal(12,2)").cast("long").as("qty_via_dec"),
        col("l_linenumber").cast("double").cast("long").as("ln_via_dbl"),
        lit("42").cast("int").as("lit_int")),
      Some("""SELECT CAST(l_orderkey AS VARCHAR) AS key_str,
             CAST(l_quantity AS INT) AS qty_int,
             CAST(l_shipdate AS DATE) AS ship_date,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
             CAST(CAST(l_quantity AS DECIMAL(12,2)) AS BIGINT) AS qty_via_dec,
             CAST(CAST(l_linenumber AS DOUBLE) AS BIGINT) AS ln_via_dbl,
             CAST('42' AS INT) AS lit_int FROM lineitem""")),

    // B24 string functions
    "q24_string_fns" -> Q(
      (s, d) => t(s, d, "customer").select(
        col("c_custkey"),
        length(col("c_name")).as("name_len"),
        upper(col("c_name")).as("uname"),
        lower(col("c_mktsegment")).as("lseg"),
        substring(col("c_name"), 1, 8).as("prefix"),
        trim(col("c_name")).as("trimmed"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
        regexp_replace(col("c_name"), "[0-9]+", "#").as("no_digits"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"),
        instr(col("c_name"), "1").as("pos1"),
        levenshtein(col("c_mktsegment"), lit("BUILDING")).as("lev"),
        format_string("%08d", col("c_custkey")).as("fmt")),
      Some("""SELECT c_custkey, CAST(length(c_name) AS INT) AS name_len,
             upper(c_name) AS uname, lower(c_mktsegment) AS lseg,
             substring(c_name, 1, 8) AS prefix, trim(c_name) AS trimmed,
             lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
             regexp_replace(c_name, '[0-9]+', '#', 'g') AS no_digits,
             concat_ws('|', c_mktsegment, c_name) AS joined,
             CAST(instr(c_name, '1') AS INT) AS pos1,
             CAST(levenshtein(c_mktsegment, 'BUILDING') AS INT) AS lev,
             printf('%08d', c_custkey) AS fmt FROM customer""")),

    // B25 math functions (transcendentals rounded: libm last-ulp drift)
    "q25_math_fns" -> Q(
      (s, d) => t(s, d, "part").select(
        col("p_partkey"),
        abs(col("p_retailprice") - 1000).as("dist"),
        round(col("p_retailprice"), 1).as("r1"),
        ceil(col("p_retailprice")).as("ceil_p"),   // Spark: BIGINT
        floor(col("p_retailprice")).as("floor_p"),
        round(pow(col("p_size"), 2), 1).as("size_sq"),
        round(sqrt(col("p_retailprice")), 6).as("sq"),
        round(exp(col("p_size") / lit(25.0)), 6).as("ex"),
        round(log(col("p_retailprice")), 6).as("lnp"),
        round(log10(col("p_retailprice")), 6).as("l10"),
        (col("p_size") % 7).as("m7"),
        signum(col("p_retailprice") - 1500).cast("int").as("sgn"),
        round(sin(col("p_size")), 6).as("sn")),
      Some("""SELECT p_partkey, abs(p_retailprice - 1000) AS dist,
             round(p_retailprice, 1) AS r1,
             CAST(ceil(p_retailprice) AS BIGINT) AS ceil_p,
             CAST(floor(p_retailprice) AS BIGINT) AS floor_p,
             round(pow(p_size, 2), 1) AS size_sq,
             round(sqrt(p_retailprice), 6) AS sq,
             round(exp(p_size / 25.0), 6) AS ex,
             round(ln(p_retailprice), 6) AS lnp,
             round(log10(p_retailprice), 6) AS l10,
             p_size % 7 AS m7,
             CAST(sign(p_retailprice - 1500) AS INT) AS sgn,
             round(sin(p_size), 6) AS sn FROM part""")),

    // B26 date/time functions
    "q26_date_fns" -> Q(
      (s, d) => t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("qtr"),
        hour(col("o_orderdate")).as("hr"),
        date_trunc("month", col("o_orderdate")).as("mstart"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("dstr"),
        datediff(lit("1998-01-01").cast("date"), col("o_orderdate")).as("days_to_98"),
        add_months(col("o_orderdate"), 2).as("plus2m"),
        last_day(col("o_orderdate")).as("eom"),
        unix_timestamp(col("o_orderdate")).as("epoch_s")),
      Some("""SELECT o_orderkey,
             CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
             CAST(day(o_orderdate) AS INT) AS dom, CAST(quarter(o_orderdate) AS INT) AS qtr,
             CAST(hour(o_orderdate) AS INT) AS hr,
             CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mstart,
             strftime(o_orderdate, '%Y-%m-%d') AS dstr,
             CAST(date_diff('day', o_orderdate, DATE '1998-01-01') AS INT) AS days_to_98,
             CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m,
             last_day(o_orderdate) AS eom,
             CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s FROM orders""")),

    // B27 array functions incl. higher-order transform/filter/aggregate
    "q27_array_fns" -> Q(
      (s, d) => t(s, d, "documents")
        .withColumn("w", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("w")).as("n_tokens"),
          element_at(col("w"), 1).as("first_word"),
          array_join(slice(col("w"), 1, 3), "-").as("top3"),
          size(array_distinct(col("w"))).as("n_distinct"),
          array_contains(col("w"), "spark").cast("int").as("has_spark"),
          size(expr("filter(w, x -> length(x) > 4)")).as("n_long"),
          expr("cast(aggregate(transform(w, x -> length(x)), 0L, (a, x) -> a + x) as bigint)").as("total_chars")),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
             SELECT doc_id, CAST(len(w) AS INT) AS n_tokens,
             w[1] AS first_word,
             array_to_string(list_slice(w, 1, 3), '-') AS top3,
             CAST(len(list_distinct(w)) AS INT) AS n_distinct,
             CAST(list_contains(w, 'spark') AS INT) AS has_spark,
             CAST(len(list_filter(w, x -> length(x) > 4)) AS INT) AS n_long,
             CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS total_chars
             FROM t""")),

    // B28 map functions (map built in Spark; oracle computes the same
    // scalars directly — the check is on values, the construction
    // exercises Spark's map surface)
    "q28_map_fns" -> Q(
      (s, d) => t(s, d, "lineitem")
        .withColumn("m", map_from_arrays(
          array(lit("qty"), lit("disc")),
          array(col("l_quantity"), col("l_discount"))))
        .withColumn("m2", map_concat(col("m"),
          map(lit("tax"), col("l_tax"))))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          element_at(col("m"), "qty").as("qty_val"),
          size(col("m2")).as("m_size"),
          array_join(map_keys(col("m2")), ",").as("keys"),
          round(expr("aggregate(map_values(m2), 0D, (a, x) -> a + x)"), 4).as("val_sum")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity AS qty_val,
             3 AS m_size, 'qty,disc,tax' AS keys,
             round(l_quantity + l_discount + l_tax, 4) AS val_sum FROM lineitem""")),

    // B29 JSON functions over the events.props JSON column
    "q29_json_fns" -> Q(
      (s, d) => t(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))).getField("k").as("k_struct"),
        to_json(struct(col("event_id").as("id"))).as("j")),
      Some("""SELECT event_id,
             CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT) AS k_val,
             CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT) AS k_struct,
             '{"id":' || event_id || '}' AS j FROM events""")),

    // B30 collect_list/collect_set (sorted for determinism) + min_by/max_by
    "q30_collect" -> Q(
      (s, d) => t(s, d, "orders").groupBy(col("o_orderpriority"))
        .agg(array_join(sort_array(collect_set(col("o_orderstatus"))), ",").as("statuses"),
             min_by(col("o_orderkey"), col("o_totalprice")).as("cheapest"),
             max_by(col("o_orderkey"), col("o_totalprice")).as("dearest")),
      Some("""SELECT o_orderpriority,
             array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
             arg_min(o_orderkey, o_totalprice) AS cheapest,
             arg_max(o_orderkey, o_totalprice) AS dearest
             FROM orders GROUP BY o_orderpriority""")),

    // B31 PIVOT (explicit value list; oracle via conditional aggregation)
    "q31_pivot" -> Q(
      (s, d) => t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum(col("l_quantity")), 2))
        .withColumnRenamed("F", "f_qty").withColumnRenamed("O", "o_qty"),
      Some("""SELECT l_returnflag,
             round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS f_qty,
             round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS o_qty
             FROM lineitem GROUP BY l_returnflag""")),

    // B32 LATERAL VIEW / generators: posexplode over the first 5 tokens
    "q32_lateral_view" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT doc_id, pos, word
           FROM documents
           LATERAL VIEW posexplode(slice(split(text, ' '), 1, 5)) t AS pos, word""") },
      Some("""SELECT doc_id, CAST(gs.i - 1 AS INT) AS pos, d.w[CAST(gs.i AS INT)] AS word
             FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) d,
             generate_series(1, 5) gs(i) WHERE gs.i <= least(len(d.w), 5)""")),

    // B33 TABLESAMPLE — nondeterministic across engines: rows-only check
    "q33_sample" -> Q(
      (s, d) => t(s, d, "lineitem").sample(withReplacement = false, 0.1, seed = 42)
        .select(col("l_orderkey"), col("l_linenumber"))),

    // Skew-resilient join ([[graft.operators.SaltedJoin]]): orders ⋈ a
    // 5-row priority dim on o_orderpriority — 5 distinct keys over 150k
    // rows means EVERY key is hot (30k rows/key), the exact shape where
    // an unsalted shuffle join puts each key in one task no matter the
    // partition count. The salt spreads each key over 16 tasks; the dim
    // replicates 16×40 bytes. Result is provably identical to the plain
    // join (each pair meets under exactly one salt) — which is what the
    // oracle checks.
    // B25 extension: EXACT percentiles (linear interpolation — Spark
    // `percentile` and DuckDB `quantile_cont` share the (1−g)·lo + g·hi
    // definition), emitted as exact-micro integers so the hash can't
    // drift on formatting. Exact percentile is the right call here
    // because l_quantity has ~50 distinct values — Spark aggregates a
    // value→count map per group, so state is O(distinct), not O(rows),
    // and that holds at 100 TB; an unbounded-cardinality column would
    // use approx_percentile instead (cross-engine incomparable → q14b
    // treatment).
    "q35_percentile" -> Q(
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.9)").as("p90"))
        .select(col("l_returnflag"),
          floor(col("p25") * 1e6 + 0.5).cast("long").as("p25_e6"),
          floor(col("p50") * 1e6 + 0.5).cast("long").as("p50_e6"),
          floor(col("p90") * 1e6 + 0.5).cast("long").as("p90_e6")),
      Some("""SELECT l_returnflag,
             |       CAST(floor(quantile_cont(l_quantity, 0.25) * 1000000 + 0.5) AS BIGINT) AS p25_e6,
             |       CAST(floor(quantile_cont(l_quantity, 0.5) * 1000000 + 0.5) AS BIGINT) AS p50_e6,
             |       CAST(floor(quantile_cont(l_quantity, 0.9) * 1000000 + 0.5) AS BIGINT) AS p90_e6
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    "q34_salted_join" -> Q(
      (s, d) => {
        val dim = t(s, d, "orders").select(col("o_orderpriority")).distinct()
          .withColumn("prio_len", length(col("o_orderpriority")))
        graft.operators.SaltedJoin.inner(
          t(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority")),
          dim, Seq("o_orderpriority"), salts = 16)
      },
      Some("""SELECT o.o_orderpriority, o.o_orderkey, CAST(length(d.o_orderpriority) AS INT) AS prio_len
             FROM orders o JOIN (SELECT DISTINCT o_orderpriority FROM orders) d
             ON o.o_orderpriority = d.o_orderpriority""")),

    // bucketed co-located join: both sides persisted hash-bucketed on the
    // join key, so the join itself needs NO exchange (BucketingSpec pins
    // the shuffle-free plan); the shuffle is paid once at write time —
    // the storage layout a reused 100 TB fact table wants.
    "q36_bucket_join" -> Q(
      (s, d) => {
        import graft.sources.Bucketed
        val cust = Bucketed.ensureTable(s, "graft_bkt", "cust_b",
          t(s, d, "customer").select(col("c_custkey"), col("c_mktsegment")),
          "c_custkey", buckets = 8)
        val ord = Bucketed.ensureTable(s, "graft_bkt", "ord_b",
          t(s, d, "orders").select(col("o_custkey"), col("o_totalprice")),
          "o_custkey", buckets = 8)
        s.table(cust).join(s.table(ord), col("c_custkey") === col("o_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"),
            sum(floor(col("o_totalprice") * 100 + 0.5)).cast("long").as("total_cents"))
      },
      Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
             |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS total_cents
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_mktsegment""".stripMargin)),

    // B21 extension: RECURSIVE CTE (new in Spark 4) — the hierarchical
    // walk (org chart / BOM explosion) that plain CTEs can't express.
    // The hierarchy is derived deterministically from real keys: node k's
    // parent is (k-1) div 2 (a binary tree rooted at nation 0); the
    // recursion carries depth and the root path. Scale shape: each
    // iteration is one equality-keyed join of the frontier against the
    // table, and the iteration COUNT is the tree height (log n) — the
    // same bounded-rounds contract as Dedup.clusters' label propagation.
    "q37_recursive_cte" -> Q(
      (s, d) => { views(s, d); s.sql(
        """WITH RECURSIVE h(k, depth, path) AS (
             SELECT n_nationkey, CAST(0 AS INT), CAST(n_nationkey AS STRING)
             FROM nation WHERE n_nationkey = 0
             UNION ALL
             SELECT n.n_nationkey, h.depth + 1,
                    concat(h.path, '>', CAST(n.n_nationkey AS STRING))
             FROM nation n JOIN h ON (n.n_nationkey - 1) div 2 = h.k
             WHERE n.n_nationkey > 0
           )
           SELECT h.k AS n_nationkey, n.n_name, h.depth, h.path
           FROM h JOIN nation n ON n.n_nationkey = h.k""") },
      Some("""WITH RECURSIVE h(k, depth, path) AS (
             |  SELECT n_nationkey, CAST(0 AS INTEGER), CAST(n_nationkey AS VARCHAR)
             |  FROM nation WHERE n_nationkey = 0
             |  UNION ALL
             |  SELECT n.n_nationkey, h.depth + 1,
             |         h.path || '>' || CAST(n.n_nationkey AS VARCHAR)
             |  FROM nation n JOIN h ON (n.n_nationkey - 1) // 2 = h.k
             |  WHERE n.n_nationkey > 0
             |)
             |SELECT h.k AS n_nationkey, n.n_name, h.depth, h.path
             |FROM h JOIN nation n ON n.n_nationkey = h.k""".stripMargin)),

    // B16/B17 extension: IGNORE NULLS forward-fill (gap-fill) — carry the
    // last observed click value forward over each user's event stream,
    // the standard last-observation-carried-forward repair for sparse
    // sensor/metric streams. Total order: (ts, event_id) — event_id is
    // unique, and the oracle orders by the MICROSECOND-truncated ts so
    // both engines see the identical sequence (events.parquet carries
    // nano timestamps; Spark reads them at micro precision).
    "q38_gap_fill" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "events").select(col("user_id"), col("event_id"), col("ts"),
            when(col("event_type") === "click",
              floor(col("value") * 100 + 0.5).cast("long")).as("click_cents"))
          .withColumn("filled_cents",
            last(col("click_cents"), ignoreNulls = true).over(w))
          .drop("ts")
      },
      Some("""SELECT user_id, event_id,
             |       CASE WHEN event_type = 'click' THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END AS click_cents,
             |       last_value(CASE WHEN event_type = 'click' THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END IGNORE NULLS)
             |         OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents
             |FROM events""".stripMargin)),

    // B15 extension: COUNT(DISTINCT) OVER a partition — not directly
    // supported by either engine's window functions; the canonical
    // rewrite is max(dense_rank) over the partition (rank the values,
    // the highest dense rank IS the distinct count). Every order in
    // sight is total, so the result is engine-exact.
    "q39_window_distinct" -> Q(
      (s, d) => {
        val rankW = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderpriority"))
        val partW = Window.partitionBy(col("o_custkey"))
        t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderpriority"))
          .withColumn("n_distinct_priorities",
            max(dense_rank().over(rankW)).over(partW).cast("long"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderpriority,
             |       CAST(max(drnk) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_distinct_priorities
             |FROM (SELECT o_custkey, o_orderkey, o_orderpriority,
             |             dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS drnk
             |      FROM orders)""".stripMargin)),

    // B31's other direction: UNPIVOT (wide -> long reshaping) via the
    // ANSI clause both engines implement natively — three measure
    // columns become (metric, val) rows in one generate pass, no union
    // of three scans. Measures pre-cast to exact integers so the value
    // column has one engine-identical type.
    "q42_unpivot" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT l_orderkey, l_linenumber, metric, val FROM (
             SELECT l_orderkey, l_linenumber,
                    CAST(l_quantity AS BIGINT) AS quantity,
                    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents,
                    CAST(floor(l_discount * 1000000 + 0.5) AS BIGINT) AS discount_e6
             FROM lineitem WHERE l_orderkey % 11 = 0)
           UNPIVOT (val FOR metric IN (quantity, price_cents, discount_e6))""") },
      Some("""SELECT l_orderkey, l_linenumber, metric, val FROM (
             |  SELECT l_orderkey, l_linenumber,
             |         CAST(l_quantity AS BIGINT) AS quantity,
             |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents,
             |         CAST(floor(l_discount * 1000000 + 0.5) AS BIGINT) AS discount_e6
             |  FROM lineitem WHERE l_orderkey % 11 = 0)
             |UNPIVOT (val FOR metric IN (quantity, price_cents, discount_e6))""".stripMargin)),

    // ANSI GROUP BY ALL (SQL:2023 direction, in both engines): group by
    // every non-aggregate select item — the aggregation surface's
    // "project then group" shorthand; planning is identical to the
    // explicit form (one map-side-combinable HashAggregate).
    "q45_group_by_all" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT o_orderstatus, o_orderpriority,
                  count(*) AS n_orders,
                  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
           FROM orders GROUP BY ALL""") },
      Some("""SELECT o_orderstatus, o_orderpriority,
             |       count(*) AS n_orders,
             |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
             |FROM orders GROUP BY ALL""".stripMargin)),

    // ANSI WINDOW clause (named windows): one window definition shared
    // by several functions — planning is identical to inlining it (one
    // Window exec over one sort); the total (cents desc, suppkey) order
    // makes rank and the running sum engine-reproducible.
    "q47_named_window" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT s_suppkey, s_nationkey,
                  rank() OVER w AS rnk,
                  CAST(sum(acct_cents) OVER w AS BIGINT) AS run_cents
           FROM (SELECT s_suppkey, s_nationkey,
                        CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS acct_cents
                 FROM supplier)
           WINDOW w AS (PARTITION BY s_nationkey ORDER BY acct_cents DESC, s_suppkey)""") },
      Some("""SELECT s_suppkey, s_nationkey,
             |       rank() OVER w AS rnk,
             |       CAST(sum(acct_cents) OVER w AS BIGINT) AS run_cents
             |FROM (SELECT s_suppkey, s_nationkey,
             |             CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS acct_cents
             |      FROM supplier)
             |WINDOW w AS (PARTITION BY s_nationkey ORDER BY acct_cents DESC, s_suppkey)""".stripMargin)),

    // ANSI LISTAGG (WITHIN GROUP ordered string aggregation, new in
    // Spark 4): one hash aggregate, the per-group sort is bounded by
    // group size — nothing corpus-wide sorts. Unique s_name makes the
    // ordered concatenation a total order, so the string is
    // engine-reproducible byte-for-byte.
    "q48_listagg" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT s_nationkey,
                  listagg(s_name, ',') WITHIN GROUP (ORDER BY s_name) AS names,
                  count(*) AS n_sup
           FROM supplier GROUP BY s_nationkey""") },
      Some("""SELECT s_nationkey,
             |       string_agg(s_name, ',' ORDER BY s_name) AS names,
             |       CAST(count(*) AS BIGINT) AS n_sup
             |FROM supplier GROUP BY s_nationkey""".stripMargin)),

    // Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL) — q20 covers
    // only the DISTINCT variants. Multiplicities matter: Spark plans
    // both as ONE hash aggregate on the key carrying two per-side
    // counts, then regenerates min(m,n) / max(m-n,0) copies — a single
    // shuffle, no join, scale-safe.
    "q49_bag_setops" -> Q(
      (s, d) => {
        val li = t(s, d, "lineitem")
        val a = li.filter(col("l_shipdate") < lit("1998-06-01").cast("timestamp"))
          .select(col("l_suppkey").as("k"))
        val b = li.filter(col("l_shipdate") >= lit("1998-06-01").cast("timestamp"))
          .select(col("l_suppkey").as("k"))
        a.intersectAll(b).withColumn("op", lit("intersect_all"))
          .unionAll(a.exceptAll(b).withColumn("op", lit("except_all")))
      },
      Some("""SELECT k, 'intersect_all' AS op FROM (
             |  SELECT l_suppkey AS k FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-06-01'
             |  INTERSECT ALL
             |  SELECT l_suppkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-06-01')
             |UNION ALL
             |SELECT k, 'except_all' AS op FROM (
             |  SELECT l_suppkey AS k FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-06-01'
             |  EXCEPT ALL
             |  SELECT l_suppkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-06-01')""".stripMargin)),

    // ANSI frame EXCLUDE clause (EXCLUDE CURRENT ROW / GROUP / TIES) —
    // Spark has no EXCLUDE, so each variant is composed from window
    // aggregates that all sort under ONE (nationkey, cents, suppkey)
    // order: excl_current = cumulative-ROWS sum minus self; the peer sum
    // needed by GROUP/TIES is a RANGE CURRENT..CURRENT frame (NOT a
    // separate PARTITION BY — that would add a second shuffle). The
    // oracle runs DuckDB's native EXCLUDE forms; empty frames are
    // coalesced to 0 to match the integer arithmetic.
    "q50_window_exclude" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT s_suppkey, s_nationkey, acct_cents,
                  CAST(sum(acct_cents) OVER (PARTITION BY s_nationkey
                         ORDER BY acct_cents, s_suppkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - acct_cents AS BIGINT) AS excl_current,
                  CAST(sum(acct_cents) OVER (PARTITION BY s_nationkey
                         ORDER BY acct_cents
                         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - sum(acct_cents) OVER (PARTITION BY s_nationkey
                           ORDER BY acct_cents
                           RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
                       AS BIGINT) AS excl_group,
                  CAST(sum(acct_cents) OVER (PARTITION BY s_nationkey
                         ORDER BY acct_cents
                         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - sum(acct_cents) OVER (PARTITION BY s_nationkey
                           ORDER BY acct_cents
                           RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
                       + acct_cents AS BIGINT) AS excl_ties
           FROM (SELECT s_suppkey, s_nationkey,
                        CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS acct_cents
                 FROM supplier)""") },
      Some("""SELECT s_suppkey, s_nationkey, acct_cents,
             |       CAST(coalesce(sum(acct_cents) OVER (PARTITION BY s_nationkey
             |              ORDER BY acct_cents, s_suppkey
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             |              EXCLUDE CURRENT ROW), 0) AS BIGINT) AS excl_current,
             |       CAST(coalesce(sum(acct_cents) OVER (PARTITION BY s_nationkey
             |              ORDER BY acct_cents
             |              RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             |              EXCLUDE GROUP), 0) AS BIGINT) AS excl_group,
             |       CAST(sum(acct_cents) OVER (PARTITION BY s_nationkey
             |              ORDER BY acct_cents
             |              RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             |              EXCLUDE TIES) AS BIGINT) AS excl_ties
             |FROM (SELECT s_suppkey, s_nationkey,
             |             CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS acct_cents
             |      FROM supplier)""".stripMargin)),

    // ANSI JOIN USING: the shared key appears ONCE in the output (not
    // qualified left/right copies) — same equality-keyed plan as ON.
    "q57_join_using" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT rk, n_name, r_name
           FROM (SELECT n_regionkey AS rk, n_name FROM nation) n
           JOIN (SELECT r_regionkey AS rk, r_name FROM region) r USING (rk)""") },
      Some("""SELECT rk, n_name, r_name
             |FROM (SELECT n_regionkey AS rk, n_name FROM nation) n
             |JOIN (SELECT r_regionkey AS rk, r_name FROM region) r USING (rk)""".stripMargin)),

    // Integer division/modulo on NEGATIVE operands — a genuine
    // cross-engine trap: Spark's `div` truncates toward zero while
    // DuckDB's `//` FLOORS (-7//2 = -4 there), and `%` truncates in
    // both. The oracle therefore spells trunc-division as
    // (x - x % 4) / 4 and positive mod as ((x % 4) + 4) % 4 — integer
    // identities, not lookalike operators.
    "q58_int_arith" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT l_orderkey, l_linenumber,
                  CAST(l_linenumber - 3 AS INT) AS x,
                  CAST((l_linenumber - 3) % 4 AS INT) AS mod_trunc,
                  CAST(pmod(l_linenumber - 3, 4) AS INT) AS mod_pos,
                  CAST((l_linenumber - 3) div 4 AS INT) AS div_trunc
           FROM lineitem""") },
      Some("""SELECT l_orderkey, l_linenumber,
             |       CAST(l_linenumber - 3 AS INT) AS x,
             |       CAST((l_linenumber - 3) % 4 AS INT) AS mod_trunc,
             |       CAST(((l_linenumber - 3) % 4 + 4) % 4 AS INT) AS mod_pos,
             |       CAST(((l_linenumber - 3) - (l_linenumber - 3) % 4) / 4 AS INT) AS div_trunc
             |FROM lineitem""".stripMargin)),

    // Explicit null ordering + pagination: ORDER BY ... DESC NULLS FIRST
    // (Spark's DESC default is NULLS LAST — the explicit clause is the
    // surface) with LIMIT/OFFSET. Pagination is only meaningful under a
    // TOTAL order (c_custkey tiebreak); Spark plans OFFSET+LIMIT as one
    // global top-(offset+limit) then drops the prefix — no full sort.
    "q55_null_order_offset" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT c_custkey, k
           FROM (SELECT c_custkey, nullif(c_nationkey, 3) AS k FROM customer)
           ORDER BY k DESC NULLS FIRST, c_custkey
           LIMIT 50 OFFSET 100""") },
      Some("""SELECT c_custkey, k
             |FROM (SELECT c_custkey, nullif(c_nationkey, 3) AS k FROM customer)
             |ORDER BY k DESC NULLS FIRST, c_custkey
             |LIMIT 50 OFFSET 100""".stripMargin)),

    // Regex capture-group backreferences in replace + indexed group
    // extract — per-row projections; the dialects differ only in
    // backreference SPELLING ($2 vs \2), not semantics.
    "q56_regex_groups" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT c_custkey,
                  regexp_replace(c_name, '([A-Za-z]+)#([0-9]+)', '$2-$1') AS swapped,
                  regexp_extract(c_name, '#([0-9]+)', 1) AS digits
           FROM customer""") },
      Some("""SELECT c_custkey,
             |       regexp_replace(c_name, '([A-Za-z]+)#([0-9]+)', '\2-\1') AS swapped,
             |       regexp_extract(c_name, '#([0-9]+)', 1) AS digits
             |FROM customer""".stripMargin)),

    // Equal-width histogram binning via ANSI width_bucket — one hash
    // aggregate over a per-row bucket projection. Integer-cent inputs
    // and a bucket width that divides the range exactly (1.1M/22 =
    // 50k) keep the boundary arithmetic below 2^53, so the double
    // division inside width_bucket is exact and every engine bins
    // identically; out-of-range rows land in the ANSI underflow (0) /
    // overflow (n+1) buckets. The oracle spells the same binning as
    // CASE+floor — DuckDB has no width_bucket.
    "q54_width_bucket" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT width_bucket(c, -100000, 1000000, 22) AS bucket,
                  count(*) AS n,
                  CAST(min(c) AS BIGINT) AS lo_cents,
                  CAST(max(c) AS BIGINT) AS hi_cents
           FROM (SELECT CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS c
                 FROM supplier)
           GROUP BY 1""") },
      Some("""SELECT CASE WHEN c < -100000 THEN 0
             |            WHEN c >= 1000000 THEN 23
             |            ELSE CAST(floor((c + 100000) / 50000.0) AS BIGINT) + 1
             |       END AS bucket,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CAST(min(c) AS BIGINT) AS lo_cents,
             |       CAST(max(c) AS BIGINT) AS hi_cents
             |FROM (SELECT CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS c
             |      FROM supplier)
             |GROUP BY 1""".stripMargin)),

    // Error-safe casts and arithmetic (TRY_CAST / try_divide / try_add):
    // malformed input becomes NULL instead of failing the job — the
    // semantics a 100 TB ingest needs (one bad row must not kill the
    // pass). All per-row projections, no shuffle. Failure paths hit a
    // SUBSET of rows, as real dirty data does — try_add/try_subtract
    // pay an internal exception per OVERFLOWING row (Math.addExact;
    // ~15 µs each — an every-row-overflows column benched this query at
    // 7× this form, while try_cast/try_divide fail exception-free), so
    // the guard belongs on genuinely-dirty columns, not as a blanket
    // rewrite of working arithmetic. The oracle spells
    // try_divide/try_add as CASE guards — DuckDB has TRY_CAST but not
    // the arithmetic variants; the semantics are identical.
    "q53_try_cast" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT l_orderkey, l_linenumber,
                  TRY_CAST(CASE WHEN l_linenumber = 3 THEN l_returnflag
                                ELSE CAST(CAST(l_quantity AS BIGINT) AS STRING)
                           END AS INT) AS qty_or_null,
                  try_divide(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT),
                             CAST(l_quantity AS BIGINT) - 25) AS per_unit,
                  try_add(9223372036854775758,
                          CAST(l_quantity AS BIGINT)) AS guarded_add
           FROM lineitem""") },
      Some("""SELECT l_orderkey, l_linenumber,
             |       TRY_CAST(CASE WHEN l_linenumber = 3 THEN l_returnflag
             |                     ELSE CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)
             |                END AS INT) AS qty_or_null,
             |       CASE WHEN CAST(l_quantity AS BIGINT) - 25 = 0 THEN NULL
             |            ELSE CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             |                 / (CAST(l_quantity AS BIGINT) - 25) END AS per_unit,
             |       CASE WHEN CAST(l_quantity AS BIGINT) > 49 THEN NULL
             |            ELSE 9223372036854775758 + CAST(l_quantity AS BIGINT)
             |       END AS guarded_add
             |FROM lineitem""".stripMargin)),

    // Distribution-ranking window functions (ntile / percent_rank /
    // cume_dist) — one Window exec over one sort; ntile demands a TOTAL
    // order (ties would make bucket assignment engine-specific), while
    // percent_rank/cume_dist are tie-stable by definition (rank-based).
    // Fractions ship as e6-floored integers: (rank-1)/(n-1) is one IEEE
    // division from identical integer operands in every engine.
    "q52_rank_distribution" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT s_suppkey, s_nationkey,
                  ntile(4) OVER w AS quartile,
                  CAST(floor(percent_rank() OVER w * 1000000 + 0.5) AS BIGINT) AS pr_e6,
                  CAST(floor(cume_dist() OVER w * 1000000 + 0.5) AS BIGINT) AS cd_e6
           FROM (SELECT s_suppkey, s_nationkey,
                        CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS c
                 FROM supplier)
           WINDOW w AS (PARTITION BY s_nationkey ORDER BY c, s_suppkey)""") },
      Some("""SELECT s_suppkey, s_nationkey,
             |       ntile(4) OVER w AS quartile,
             |       CAST(floor(percent_rank() OVER w * 1000000 + 0.5) AS BIGINT) AS pr_e6,
             |       CAST(floor(cume_dist() OVER w * 1000000 + 0.5) AS BIGINT) AS cd_e6
             |FROM (SELECT s_suppkey, s_nationkey,
             |             CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS c
             |      FROM supplier)
             |WINDOW w AS (PARTITION BY s_nationkey ORDER BY c, s_suppkey)""".stripMargin)),

    // Correlated scalar subqueries in SELECT — Catalyst decorrelates
    // each into an aggregate + left outer join (and MergeScalarSubqueries
    // can fuse same-source subqueries into one), so nothing executes
    // per-row. Includes the classic COUNT bug: count(*) over an empty
    // correlation must be 0, not NULL — max over the same must stay NULL.
    "q51_correlated_scalar" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT c_custkey,
                  (SELECT CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   FROM orders o WHERE o.o_custkey = c.c_custkey) AS max_cents,
                  (SELECT count(*) FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderstatus = 'F') AS n_final
           FROM customer c""") },
      Some("""SELECT c_custkey,
             |       (SELECT CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             |        FROM orders o WHERE o.o_custkey = c.c_custkey) AS max_cents,
             |       (SELECT count(*) FROM orders o
             |         WHERE o.o_custkey = c.c_custkey
             |           AND o.o_orderstatus = 'F') AS n_final
             |FROM customer c""".stripMargin)),

    // Null-safe equality join (<=> / IS NOT DISTINCT FROM): the join
    // form of q06b's NOT-IN null semantics — null matches null, unlike
    // `=`. Still an EQUALITY-keyed join plan (hash/sort-merge on the
    // null-wrapped key), not a nested loop.
    "q46_null_safe_join" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT n.n_name, r.r_name, n.k AS nk
           FROM (SELECT n_name, nullif(n_regionkey, 2) AS k FROM nation) n
           JOIN (SELECT r_name, nullif(r_regionkey, 2) AS k FROM region) r
             ON n.k <=> r.k""") },
      Some("""SELECT n.n_name, r.r_name, n.k AS nk
             |FROM (SELECT n_name, nullif(n_regionkey, 2) AS k FROM nation) n
             |JOIN (SELECT r_name, nullif(r_regionkey, 2) AS k FROM region) r
             |  ON n.k IS NOT DISTINCT FROM r.k""".stripMargin)),

    // Pure band join (no equality key): Spark's native plan is a
    // BroadcastNestedLoopJoin — O(n×m), dead at scale when the interval
    // side outgrows a broadcast. graft.operators.RangeJoin buckets the
    // value axis so the SAME semantics plan as an equality join (see
    // RangeJoinSpec for the no-nested-loop plan assertion); the oracle
    // runs the plain BETWEEN form.
    "q44_range_band_join" -> Q(
      (s, d) => {
        val sup = t(s, d, "supplier")
          .select(col("s_suppkey"), (col("s_acctbal") - 100).as("lo"),
            (col("s_acctbal") + 100).as("hi"))
        val cust = t(s, d, "customer").select(col("c_custkey"), col("c_acctbal"))
        graft.operators.RangeJoin.bandJoin(cust, sup, "c_acctbal", "lo", "hi",
            bucket = 200.0)
          .groupBy(col("s_suppkey"))
          .agg(count(lit(1)).as("n_in_band"),
            sum(floor(col("c_acctbal") * 100 + 0.5).cast("long")).as("sum_band_cents"))
      },
      Some("""SELECT s_suppkey, count(*) AS n_in_band,
             |       CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_band_cents
             |FROM supplier JOIN customer
             |  ON c_acctbal >= s_acctbal - 100 AND c_acctbal <= s_acctbal + 100
             |GROUP BY s_suppkey""".stripMargin)),

    // ANSI LATERAL: a correlated derived table on the join's right side —
    // the "run this subquery once per outer row" surface (SQL:1999),
    // which Catalyst decorrelates into a plain aggregate + join (one
    // shuffle on the correlation key, never a per-row re-execution); a
    // customer with no orders still gets its one aggregate row (0, null),
    // the semantics a GROUP BY + inner join would silently drop.
    "q43_lateral_join" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT c.c_custkey, c.c_mktsegment, t.n_orders, t.max_cents
           FROM customer c,
           LATERAL (
             SELECT count(*) AS n_orders,
                    CAST(floor(max(o_totalprice) * 100 + 0.5) AS BIGINT) AS max_cents
             FROM orders o WHERE o.o_custkey = c.c_custkey
           ) t""") },
      Some("""SELECT c.c_custkey, c.c_mktsegment, t.n_orders, t.max_cents
             |FROM customer c,
             |LATERAL (
             |  SELECT count(*) AS n_orders,
             |         CAST(floor(max(o_totalprice) * 100 + 0.5) AS BIGINT) AS max_cents
             |  FROM orders o WHERE o.o_custkey = c.c_custkey
             |) t""".stripMargin)),

    // B17 extension: RANGE frame bounded by a TIME INTERVAL — the
    // rolling-window-per-event shape (count/sum over the trailing hour)
    // that ROWS frames cannot express when event density varies. RANGE
    // includes ORDER-BY peers, so tied timestamps need no tiebreaker —
    // the frame is deterministic by construction. The oracle orders by
    // the microsecond-truncated timestamp (events.parquet carries nanos;
    // Spark reads micros) so both engines see identical frame bounds.
    "q41_range_interval_frame" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT user_id, event_id,
             CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
             sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS cents_last_hour
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts
                        RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""") },
      Some("""SELECT user_id, event_id,
             |       CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
             |       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS BIGINT) AS cents_last_hour
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY make_timestamp(epoch_ns(ts) // 1000)
             |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""".stripMargin)),

    // B9/B12 extension: FILTER (WHERE …) aggregate modifiers — the ANSI
    // form of conditional aggregation (one pass computes several
    // differently-filtered aggregates; the pre-ANSI rewrite is a CASE
    // expression inside each aggregate). Still ONE map-side-combinable
    // HashAggregate: each FILTER is a per-row predicate on the partial
    // update, not an extra scan or shuffle. Money compared in exact
    // cents so both engines hash identically.
    "q40_filtered_agg" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT o_orderpriority,
             count(*) AS n_orders,
             count(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
             CAST(coalesce(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
               FILTER (WHERE o_orderstatus = 'F'), 0) AS BIGINT) AS finished_cents,
             CAST(count(DISTINCT o_custkey) FILTER (WHERE o_orderdate >= DATE '1995-01-01') AS BIGINT) AS n_custs_recent
           FROM orders GROUP BY o_orderpriority""") },
      Some("""SELECT o_orderpriority,
             |       count(*) AS n_orders,
             |       count(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
             |       CAST(coalesce(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |         FILTER (WHERE o_orderstatus = 'F'), 0) AS BIGINT) AS finished_cents,
             |       CAST(count(DISTINCT o_custkey) FILTER (WHERE o_orderdate >= DATE '1995-01-01') AS BIGINT) AS n_custs_recent
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // Bitwise operators — per-row integer projections (hash-partition
    // keys, bloom/bitmap masks, flag unpacking all live here). Exact
    // integer semantics in both engines; only SPELLING differs (Spark
    // `^`/`shiftleft` vs DuckDB `xor()`/`<<`), and result WIDTHS are
    // CAST-pinned (DuckDB bit_count returns TINYINT, Spark INT).
    "q59_bitwise" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT l_orderkey, l_linenumber,
                  CAST(l_orderkey & 255 AS BIGINT) AS band,
                  CAST(l_orderkey | 15 AS BIGINT) AS bor,
                  CAST(l_orderkey ^ 90 AS BIGINT) AS bxor,
                  CAST(~l_orderkey AS BIGINT) AS bnot,
                  CAST(shiftleft(l_orderkey, 2) AS BIGINT) AS shl,
                  CAST(shiftright(l_orderkey, 1) AS BIGINT) AS shr,
                  CAST(bit_count(l_orderkey) AS INT) AS popcnt
           FROM lineitem""") },
      Some("""SELECT l_orderkey, l_linenumber,
             |       CAST(l_orderkey & 255 AS BIGINT) AS band,
             |       CAST(l_orderkey | 15 AS BIGINT) AS bor,
             |       CAST(xor(l_orderkey, 90) AS BIGINT) AS bxor,
             |       CAST(~l_orderkey AS BIGINT) AS bnot,
             |       CAST(l_orderkey << 2 AS BIGINT) AS shl,
             |       CAST(l_orderkey >> 1 AS BIGINT) AS shr,
             |       CAST(bit_count(l_orderkey) AS INT) AS popcnt
             |FROM lineitem""".stripMargin)),

    // Linear-regression aggregates (regr_slope/intercept/r2/count) +
    // corr/covar — one map-side-combinable HashAggregate via streaming
    // co-moments in both engines (never a two-pass mean-then-residual
    // scan). Roundings are sized to each statistic's magnitude so the
    // engines' co-moment accumulation-order wobble (≲1e-10 relative on
    // this data) stays below the emitted precision.
    "q60_regression" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT l_returnflag,
                  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
                  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
                  round(regr_intercept(l_extendedprice, l_quantity), 2) AS icept,
                  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
                  round(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
                  round(covar_samp(l_extendedprice, l_quantity), 2) AS cov_s
           FROM lineitem GROUP BY l_returnflag""") },
      Some("""SELECT l_returnflag,
             |       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
             |       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
             |       round(regr_intercept(l_extendedprice, l_quantity), 2) AS icept,
             |       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
             |       round(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
             |       round(covar_samp(l_extendedprice, l_quantity), 2) AS cov_s
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // Boolean aggregates + higher-moment statistics. bool_and/bool_or/
    // count_if spell identically; skewness/kurtosis DON'T — Spark's are
    // POPULATION moments while DuckDB's skewness is the bias-corrected
    // SAMPLE statistic (kurtosis_pop matches directly), so the oracle
    // applies the exact g1 = G1·(n-2)/√(n(n-1)) de-correction rather
    // than pretending the same name means the same estimator.
    "q61_bool_moments" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT l_returnflag,
                  bool_and(l_quantity > 0) AS all_pos,
                  bool_or(l_tax > 0.07) AS any_high_tax,
                  CAST(count_if(l_discount = 0) AS BIGINT) AS n_nodisc,
                  round(skewness(l_quantity), 6) AS skew_qty,
                  round(kurtosis(l_quantity), 6) AS kurt_qty
           FROM lineitem GROUP BY l_returnflag""") },
      Some("""SELECT l_returnflag,
             |       bool_and(l_quantity > 0) AS all_pos,
             |       bool_or(l_tax > 0.07) AS any_high_tax,
             |       CAST(count_if(l_discount = 0) AS BIGINT) AS n_nodisc,
             |       round(skewness(l_quantity) * (count(*) - 2)
             |             / sqrt(count(*) * (count(*) - 1.0)), 6) AS skew_qty,
             |       round(kurtosis_pop(l_quantity), 6) AS kurt_qty
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // IGNORE NULLS window navigation (first/last/nth_value) — the
    // gap-carry-forward surface (LOCF imputation over sparse columns).
    // One Window exec over one sort; the running frame makes last_value
    // IGNORE NULLS the classic "latest non-null so far". The null
    // pattern is deterministic (custkey % 3) and the dialects differ
    // only in WHERE the modifier sits (after the call vs inside it).
    "q62_ignore_nulls" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT c_custkey, c_nationkey,
                  first_value(k) IGNORE NULLS OVER w AS first_k,
                  last_value(k) IGNORE NULLS OVER w AS carry_k,
                  nth_value(k, 2) IGNORE NULLS OVER w AS second_k
           FROM (SELECT c_custkey, c_nationkey,
                        CASE WHEN c_custkey % 3 = 0 THEN NULL
                             ELSE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                        END AS k
                 FROM customer)
           WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_custkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""") },
      Some("""SELECT c_custkey, c_nationkey,
             |       first_value(k IGNORE NULLS) OVER w AS first_k,
             |       last_value(k IGNORE NULLS) OVER w AS carry_k,
             |       nth_value(k, 2 IGNORE NULLS) OVER w AS second_k
             |FROM (SELECT c_custkey, c_nationkey,
             |             CASE WHEN c_custkey % 3 = 0 THEN NULL
             |                  ELSE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
             |             END AS k
             |      FROM customer)
             |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_custkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin)),

    // Selector aggregates (max_by/min_by ↔ arg_max/arg_min): "the id of
    // the row with the extreme value" without a self-join or window —
    // one map-side-combinable HashAggregate. Ties would make the picked
    // row engine-specific, so the ordering value is made UNIQUE per
    // group: Spark orders a (cents, orderkey) STRUCT lexicographically
    // (injective at ANY scale, no key-range assumption); DuckDB's
    // arg_max can't order structs, so the oracle builds the same total
    // order in HUGEINT (cents*1e10 + orderkey — injective while
    // orderkey < 1e10, beyond TPC-H sf1000's keyspace).
    "q64_arg_extremes" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT o_orderpriority,
                  max_by(o_orderkey, struct(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), o_orderkey)) AS top_order,
                  min_by(o_orderkey, struct(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), o_orderkey)) AS bottom_order,
                  CAST(max(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS max_cents
           FROM orders GROUP BY o_orderpriority""") },
      Some("""SELECT o_orderpriority,
             |       arg_max(o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS HUGEINT) * 10000000000 + o_orderkey) AS top_order,
             |       arg_min(o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS HUGEINT) * 10000000000 + o_orderkey) AS bottom_order,
             |       CAST(max(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS max_cents
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // Higher-order lambda surface beyond q27's filter/transform/
    // aggregate: exists / forall (quantifiers), zip_with (pairwise
    // combine), sort_array, array_position. All per-row, no shuffle.
    // DuckDB spells quantifiers as list_filter cardinality, zip_with as
    // an index-range transform, and list_position returns NULL where
    // Spark returns 0 for absent — coalesced to align.
    "q65_lambda_fns" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT doc_id,
                  exists(w, x -> x = 'the') AS has_the,
                  forall(w, x -> length(x) < 12) AS all_short,
                  CAST(aggregate(zip_with(w, reverse(w), (a, b) -> length(a) * length(b)),
                                 0L, (acc, x) -> acc + x) AS BIGINT) AS cross_len,
                  element_at(sort_array(w, false), 1) AS max_token,
                  CAST(array_position(w, 'data') AS BIGINT) AS data_pos
           FROM (SELECT doc_id, filter(split(trim(text), '\\s+'), x -> x != '') AS w
                 FROM documents)""") },
      Some("""SELECT doc_id,
             |       len(list_filter(w, x -> x = 'the')) > 0 AS has_the,
             |       len(list_filter(w, x -> length(x) < 12)) = len(w) AS all_short,
             |       CAST(list_sum(list_transform(range(1, len(w) + 1),
             |                     i -> length(w[i]) * length(w[len(w) - i + 1]))) AS BIGINT) AS cross_len,
             |       list_reverse_sort(w)[1] AS max_token,
             |       CAST(coalesce(list_position(w, 'data'), 0) AS BIGINT) AS data_pos
             |FROM (SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS w
             |      FROM documents)""".stripMargin)),

    // Calendar-part extraction + month arithmetic beyond q26 — the
    // cross-engine TRAP surface: Spark's dayofweek is 1-based from
    // Sunday while DuckDB's is 0-based (oracle adds 1); date_trunc
    // returns TIMESTAMP in Spark but DATE in DuckDB (CAST-pinned);
    // add_months and interval-month addition both clamp to month end.
    // All per-row projections.
    "q66_date_parts" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT o_orderkey,
                  quarter(o_orderdate) AS qtr,
                  dayofweek(o_orderdate) AS dow1,
                  dayofyear(o_orderdate) AS doy,
                  weekofyear(o_orderdate) AS iso_week,
                  last_day(o_orderdate) AS month_end,
                  add_months(o_orderdate, 3) AS plus3m,
                  CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qtr_start
           FROM orders""") },
      Some("""SELECT o_orderkey,
             |       CAST(quarter(o_orderdate) AS INT) AS qtr,
             |       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow1,
             |       CAST(dayofyear(o_orderdate) AS INT) AS doy,
             |       CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
             |       last_day(o_orderdate) AS month_end,
             |       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
             |       CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qtr_start
             |FROM orders""".stripMargin)),

    // Map lambda surface beyond q28's construction/access:
    // transform_keys / transform_values / map_filter / map_zip_with.
    // DuckDB's MAP lambdas don't mirror these, so the oracle projects
    // each op to its scalar equivalent over the same integer-cents
    // inputs (the q28 discipline) — the Spark side still exercises the
    // real map operators end-to-end.
    "q68_map_lambdas" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT l_orderkey, l_linenumber,
                  element_at(transform_values(m, (k, v) -> v * 2), 'qty') AS qty2,
                  array_join(map_keys(transform_keys(m, (k, v) -> upper(k))), ',') AS ukeys,
                  size(map_filter(m, (k, v) -> v >= 25)) AS n_big,
                  element_at(map_zip_with(m, m2, (k, v1, v2) ->
                    coalesce(v1, 0L) + coalesce(v2, 0L)), 'tax') AS tax_sum
           FROM (SELECT l_orderkey, l_linenumber,
                        map('qty', CAST(l_quantity AS BIGINT),
                            'disc', CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS m,
                        map('tax', CAST(floor(l_tax * 100 + 0.5) AS BIGINT)) AS m2
                 FROM lineitem)""") },
      Some("""SELECT l_orderkey, l_linenumber,
             |       CAST(l_quantity AS BIGINT) * 2 AS qty2,
             |       'QTY,DISC' AS ukeys,
             |       CAST(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END
             |            + CASE WHEN floor(l_discount * 100 + 0.5) >= 25 THEN 1 ELSE 0 END AS INT) AS n_big,
             |       CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS tax_sum
             |FROM lineitem""".stripMargin)),

    // String-distance + field-extraction surface beyond q24: edit
    // distance (the fuzzy-matching primitive ext68 builds its dedup
    // verify on), delimiter field extraction (split_part), pattern
    // counting, and fixed-width slicing — all per-row projections that
    // spell IDENTICALLY in both dialects except regexp_count, which
    // DuckDB phrases as len(regexp_extract_all).
    "q67_string_distance" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT c_custkey,
                  levenshtein(c_name, reverse(c_name)) AS lev_rev,
                  split_part(c_name, '#', 2) AS id_part,
                  CAST(regexp_count(c_name, '[0-9]') AS BIGINT) AS n_digits,
                  left(c_name, 4) AS head4,
                  right(c_name, 3) AS tail3,
                  translate(c_name, '#', '-') AS dashed
           FROM customer""") },
      Some("""SELECT c_custkey,
             |       levenshtein(c_name, reverse(c_name)) AS lev_rev,
             |       split_part(c_name, '#', 2) AS id_part,
             |       CAST(len(regexp_extract_all(c_name, '[0-9]')) AS BIGINT) AS n_digits,
             |       left(c_name, 4) AS head4,
             |       right(c_name, 3) AS tail3,
             |       translate(c_name, '#', '-') AS dashed
             |FROM customer""".stripMargin)),

    // Schema-aligning union (unionByName allowMissingColumns=true /
    // UNION ALL BY NAME): position-independent column matching with
    // null-fill for absent columns — the multi-source ingest shape
    // where file batches carry drifting schemas. Pure narrow concat:
    // no shuffle, no dedup.
    "q63_union_byname" -> Q(
      (s, d) => t(s, d, "nation")
        .select(col("n_nationkey").cast("long").as("id"),
          col("n_name").as("name"), col("n_regionkey").cast("long").as("region_id"))
        .unionByName(
          t(s, d, "region").select(col("r_regionkey").cast("long").as("id"),
            col("r_name").as("name")),
          allowMissingColumns = true),
      Some("""SELECT CAST(n_nationkey AS BIGINT) AS id, n_name AS name,
             |       CAST(n_regionkey AS BIGINT) AS region_id
             |FROM nation
             |UNION ALL BY NAME
             |SELECT CAST(r_regionkey AS BIGINT) AS id, r_name AS name FROM region""".stripMargin)),

    // Top-k per key via graft's bounded-heap aggregate (functions/
    // TopKBy.scala, operators/TopK.scala) instead of the
    // window-row_number form: each map task ships at most k rows per
    // key into the exchange and nobody sorts a whole partition. The
    // oracle IS the window form — same rows when the ord is total
    // (cents then orderkey, both descending).
    "q69_topk_per_key" -> Q(
      (s, d) => {
        val joined = t(s, d, "orders")
          .join(t(s, d, "customer"),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("mkt"), col("o_orderkey"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        graft.operators.TopK.perKey(
          joined, Seq("mkt"), Seq(col("cents"), col("o_orderkey")), k = 3)
      },
      Some("""SELECT mkt, o_orderkey, cents FROM (
             |  SELECT c.c_mktsegment AS mkt, o.o_orderkey,
             |         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             |         row_number() OVER (PARTITION BY c.c_mktsegment
             |           ORDER BY CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) DESC,
             |                    o.o_orderkey DESC) AS rn
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
             |WHERE rn <= 3""".stripMargin)),

    // Ordered-set aggregates: percentile_disc / percentile_cont
    // (WITHIN GROUP) + mode. Both engines implement the SQL-standard
    // definitions (disc: smallest value with cume_dist >= p; cont:
    // linear interpolation at rank p*(n-1)) — verified on [1,2,3,4].
    // Inputs are integer cents and p ∈ {0.25, 0.5}, so every cont
    // interpolation is an exact binary quarter: no float rounding
    // needed. mode's input is engineered 3:1 so a frequency tie is
    // impossible (both engines break ties arbitrarily).
    "q70_ordered_set_agg" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT o_orderpriority,
                  mode(maj) AS majority,
                  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS med_disc,
                  percentile_cont(0.25) WITHIN GROUP (ORDER BY cents) AS q1_cont,
                  percentile_cont(0.5) WITHIN GROUP (ORDER BY cents) AS med_cont
           FROM (SELECT o_orderpriority,
                        CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                        CASE WHEN o_orderkey % 4 = 0 THEN 'rare' ELSE 'common' END AS maj
                 FROM orders)
           GROUP BY o_orderpriority""") },
      Some("""SELECT o_orderpriority,
             |       mode(maj) AS majority,
             |       CAST(quantile_disc(cents, 0.5) AS BIGINT) AS med_disc,
             |       quantile_cont(cents, 0.25) AS q1_cont,
             |       quantile_cont(cents, 0.5) AS med_cont
             |FROM (SELECT o_orderpriority,
             |             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             |             CASE WHEN o_orderkey % 4 = 0 THEN 'rare' ELSE 'common' END AS maj
             |      FROM orders)
             |GROUP BY o_orderpriority""".stripMargin)),

    // URL + key:value-pair extraction: parse_url and str_to_map — the
    // clickstream/ETL string surface. DuckDB has neither builtin, so
    // the oracle re-derives each field with regexes over the same
    // synthesized URL (the q68 "project to scalar equivalent"
    // discipline); the Spark side runs the real builtins.
    "q71_url_strmap" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT c_custkey,
                  parse_url(url, 'HOST') AS host,
                  parse_url(url, 'PATH') AS path,
                  parse_url(url, 'QUERY', 'seg') AS seg,
                  element_at(str_to_map(kv, ',', ':'), 'bucket') AS bucket
           FROM (SELECT c_custkey,
                        concat('https://shard', CAST(c_custkey % 5 AS STRING),
                               '.example.com/cust/', CAST(c_custkey AS STRING),
                               '?seg=', lower(c_mktsegment), '&v=1') AS url,
                        concat('seg:', lower(c_mktsegment),
                               ',bucket:', CAST(c_custkey % 7 AS STRING)) AS kv
                 FROM customer)""") },
      Some("""SELECT c_custkey,
             |       'shard' || CAST(c_custkey % 5 AS VARCHAR) || '.example.com' AS host,
             |       '/cust/' || CAST(c_custkey AS VARCHAR) AS path,
             |       lower(c_mktsegment) AS seg,
             |       CAST(c_custkey % 7 AS VARCHAR) AS bucket
             |FROM customer""".stripMargin)),

    // Row generators: stack (inline VALUES unpivot) × posexplode over
    // sequence — the two Spark generator forms q32/q42 don't cover.
    // Cross of both generators per nation row (2 tags × 1..3 seq
    // elements). DuckDB spells them UNION ALL + lateral
    // generate_series.
    "q72_generators" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT n_nationkey, s.tag, s.sval, p.pos, p.e
           FROM nation
           LATERAL VIEW stack(2, 'name', n_name,
                                 'region', CAST(n_regionkey AS STRING)) s AS tag, sval
           LATERAL VIEW posexplode(sequence(1, CAST(n_nationkey % 3 + 1 AS INT))) p AS pos, e""") },
      Some("""WITH tags AS (
             |  SELECT n_nationkey, 'name' AS tag, n_name AS sval FROM nation
             |  UNION ALL
             |  SELECT n_nationkey, 'region', CAST(n_regionkey AS VARCHAR) FROM nation
             |), seq AS (
             |  SELECT n_nationkey, CAST(g - 1 AS INT) AS pos, CAST(g AS INT) AS e
             |  FROM (SELECT n_nationkey,
             |               unnest(generate_series(1, n_nationkey % 3 + 1)) AS g
             |        FROM nation)
             |)
             |SELECT t.n_nationkey, t.tag, t.sval, s.pos, s.e
             |FROM tags t JOIN seq s USING (n_nationkey)""".stripMargin)),

    // B8 again, through graft's NATIVE as-of operator (plans/
    // AsOfJoinPlan.scala: logical node → strategy → merge-scan exec
    // with declared clustering + ordering requirements) — q08's exact
    // shape and oracle, so the custom physical operator is held to the
    // same DuckDB ASOF truth as the union+window composition.
    "q73_asof_planned" -> Q(
      (s, d) => {
        val ev = t(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts"), col("value").as("err_value"))
        graft.operators.AsOfJoin.joinPlanned(clicks, errors, Seq("user_id"), "ts", "ts")
          .select(col("event_id"), col("user_id"), col("err_value"))
      },
      Some("""SELECT c.event_id, c.user_id, e.value AS err_value
             FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
             ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'error') e
             ON c.user_id = e.user_id AND c.ts >= e.ts""")),

    // Spark's plan-shaping SQL clauses: DISTRIBUTE BY (hash exchange),
    // SORT BY (partition-local sort), CLUSTER BY (both) — the physical
    // layout controls an ETL SELECT uses before a partitioned write.
    // They change the PLAN, not the result multiset, which is exactly
    // what the oracle pins (DuckDB has no such clauses — the same
    // projection, content-compared). The Spark plan shape itself is
    // asserted in PlanAuditSpec territory: here the contract is that
    // layout clauses never alter data.
    "q74_distribute_cluster_by" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT o_orderkey,
                  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                  o_orderpriority
           FROM orders
           WHERE o_orderkey % 3 = 0
           CLUSTER BY o_orderpriority""") },
      Some("""SELECT o_orderkey,
             |       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             |       o_orderpriority
             |FROM orders
             |WHERE o_orderkey % 3 = 0""".stripMargin)),

    // Lateral column aliases (SQL:2023-ish; Spark 3.4+, DuckDB native):
    // a SELECT-list alias referenced by LATER expressions in the same
    // list — the incremental-derivation style every hand-written ETL
    // SELECT wants, without a nested subquery per step.
    "q75_lateral_alias" -> Q(
      (s, d) => { views(s, d); s.sql(
        """SELECT l_orderkey, l_linenumber,
                  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
                  cents - CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT) AS net_cents,
                  net_cents + CAST(floor(l_extendedprice * l_tax * 100 + 0.5) AS BIGINT) AS gross_cents
           FROM lineitem""") },
      Some("""SELECT l_orderkey, l_linenumber,
             |       CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
             |       cents - CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT) AS net_cents,
             |       net_cents + CAST(floor(l_extendedprice * l_tax * 100 + 0.5) AS BIGINT) AS gross_cents
             |FROM lineitem""".stripMargin)),

    // Semi-structured VARIANT tier (Spark 4 parse_json / variant_get /
    // try_variant_get / try_parse_json / is_variant_null): raw-crawl
    // JSON with schema DRIFT, which B29's static-schema from_json (q29)
    // cannot absorb — the shape varies per row (nested object vs array
    // vs explicit null), and extraction is by typed path at query time.
    // JSON text is synthesized deterministically from orders (the q71
    // discipline) so DuckDB can re-derive every field with its own JSON
    // functions over the identical strings. Pins: typed path extraction
    // through objects and array indexes, missing-path => SQL NULL,
    // try_variant_get invalid-cast => NULL (array as bigint),
    // is_variant_null distinguishing present-null from missing, and
    // try_parse_json on malformed text => NULL.
    "q76_variant" -> Q(
      (s, d) => { views(s, d); s.sql(
        """WITH src AS (
             SELECT o_orderkey, o_orderkey % 3 AS shape,
                    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                    o_orderpriority AS pri
             FROM orders),
           js AS (
             SELECT o_orderkey, shape,
                    CASE shape
                      WHEN 0 THEN concat('{"id":', CAST(o_orderkey AS STRING),
                                         ',"price_cents":', CAST(cents AS STRING),
                                         ',"cust":{"seg":"', pri, '"}}')
                      WHEN 1 THEN concat('{"id":', CAST(o_orderkey AS STRING),
                                         ',"price_cents":', CAST(cents AS STRING),
                                         ',"tags":["t0","t', CAST(o_orderkey % 7 AS STRING), '"]}')
                      ELSE concat('{"id":', CAST(o_orderkey AS STRING), ',"extra":null}')
                    END AS j
             FROM src),
           v AS (SELECT o_orderkey, shape, j, parse_json(j) AS pv FROM js)
           SELECT o_orderkey,
                  variant_get(pv, '$.id', 'bigint') AS id,
                  try_variant_get(pv, '$.price_cents', 'bigint') AS price_cents,
                  variant_get(pv, '$.cust.seg', 'string') AS seg,
                  variant_get(pv, '$.tags[1]', 'string') AS tag1,
                  try_variant_get(pv, '$.tags', 'bigint') AS tags_as_int,
                  is_variant_null(variant_get(pv, '$.extra')) AS extra_is_null,
                  try_parse_json(CASE WHEN shape = 2 THEN substr(j, 1, 5) ELSE j END) IS NULL AS is_broken
           FROM v""") },
      Some("""WITH src AS (
             |  SELECT o_orderkey, o_orderkey % 3 AS shape,
             |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             |         o_orderpriority AS pri
             |  FROM orders),
             |js AS (
             |  SELECT o_orderkey, shape,
             |         CASE shape
             |           WHEN 0 THEN '{"id":' || CAST(o_orderkey AS VARCHAR) ||
             |                       ',"price_cents":' || CAST(cents AS VARCHAR) ||
             |                       ',"cust":{"seg":"' || pri || '"}}'
             |           WHEN 1 THEN '{"id":' || CAST(o_orderkey AS VARCHAR) ||
             |                       ',"price_cents":' || CAST(cents AS VARCHAR) ||
             |                       ',"tags":["t0","t' || CAST(o_orderkey % 7 AS VARCHAR) || '"]}'
             |           ELSE '{"id":' || CAST(o_orderkey AS VARCHAR) || ',"extra":null}'
             |         END AS j
             |  FROM src)
             |SELECT o_orderkey,
             |       CAST(json_extract_string(j, '$.id') AS BIGINT) AS id,
             |       TRY_CAST(json_extract_string(j, '$.price_cents') AS BIGINT) AS price_cents,
             |       json_extract_string(j, '$.cust.seg') AS seg,
             |       json_extract_string(j, '$.tags[1]') AS tag1,
             |       CAST(NULL AS BIGINT) AS tags_as_int,
             |       coalesce(json_type(j, '$.extra') = 'NULL', false) AS extra_is_null,
             |       (shape = 2) AS is_broken
             |FROM js""".stripMargin)),

    // SQL pipe syntax (|>, Spark 4 / SQL:2023 trajectory): the same
    // filter→aggregate→derive→order chain a plain SELECT spells
    // inside-out, written top-down. Pipe syntax is pure surface — it
    // plans identically to the plain form (PipeSyntaxSpec pins the
    // optimized plans equal) — so the oracle runs the plain spelling.
    "q77_pipe_syntax" -> Q(
      (s, d) => { views(s, d); s.sql(
        """FROM lineitem
           |> WHERE l_quantity BETWEEN 5 AND 45
           |> AGGREGATE CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
                        GROUP BY l_returnflag, l_linestatus
           |> EXTEND cents div n AS avg_cents
           |> WHERE n > 10
           |> SELECT l_returnflag, l_linestatus, n, cents, avg_cents""") },
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
             |       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             |         // CAST(count(*) AS BIGINT) AS avg_cents
             |FROM lineitem
             |WHERE l_quantity BETWEEN 5 AND 45
             |GROUP BY l_returnflag, l_linestatus
             |HAVING count(*) > 10""".stripMargin)),

    // Declarative SQL UDFs (CREATE FUNCTION ... RETURN, Spark 4): the
    // B34 escape hatch WITHOUT a jar — a scalar money-normalizer reused
    // across the select list, plus a table-valued SQL UDF lateral-joined
    // as a row generator. Both inline into the plan (no black-box UDF
    // penalty); the oracle spells the expanded expressions directly.
    "q78_sql_udf" -> Q(
      (s, d) => { views(s, d);
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_cents(x DOUBLE)
                 RETURNS BIGINT RETURN CAST(floor(x * 100 + 0.5) AS BIGINT)""")
        // NB: a SQL scalar UDF may not appear in a SQL TVF's argument
        // (UNSUPPORTED_SQL_UDF_USAGE) — the cents normalization happens
        // inside the TVF body instead.
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_tiers(x DOUBLE)
                 RETURNS TABLE (tier INT, tier_cap BIGINT)
                 RETURN SELECT t, CAST(least(CAST(floor(x * 100 + 0.5) AS BIGINT),
                                             t * 10000000) AS BIGINT)
                        FROM (SELECT explode(sequence(1, 3)) AS t)""")
        s.sql(
        """SELECT o.o_orderkey, graft_cents(o.o_totalprice) AS cents, g.tier, g.tier_cap
           FROM orders o, LATERAL graft_tiers(o.o_totalprice) g
           WHERE o.o_orderkey % 10 = 0""") },
      Some("""SELECT o_orderkey,
             |       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             |       CAST(t AS INT) AS tier,
             |       CAST(least(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT),
             |                  t * 10000000) AS BIGINT) AS tier_cap
             |FROM orders, (SELECT unnest(generate_series(1, 3)) AS t)
             |WHERE o_orderkey % 10 = 0""".stripMargin)),

    // Collated comparison semantics (Spark 4 collations): a
    // case-insensitive (UTF8_LCASE) GROUP BY and JOIN over deliberately
    // case-mangled segment strings — the "dirty categorical column"
    // normalization every warehouse does with lower() scattered through
    // the query, expressed once as a column collation instead. The
    // GROUP BY key is the collated column (all case variants land in
    // one group); the output value is min(raw) (binary order:
    // uppercase < lowercase, deterministic), never the collated key
    // itself (which group representative survives is
    // evaluation-order-dependent). DuckDB has no column collations —
    // the oracle normalizes with lower() and re-derives min(raw).
    // Plan note: Spark 4.1 plans the collated-key join as SortMergeJoin
    // even under a BROADCAST hint (hash-side support for non-binary
    // collations is restricted); at scale, pre-normalizing the join key
    // (lower()) recovers the broadcast plan when the collation is only
    // case folding — the collated form is the SEMANTIC surface pin.
    "q79_collation" -> Q(
      (s, d) => { views(s, d); s.sql(
        """WITH mixed AS (
             SELECT c_custkey,
                    CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                         ELSE lower(c_mktsegment) END AS seg
             FROM customer),
           dim AS (SELECT DISTINCT lower(c_mktsegment) AS seg_l FROM customer)
           SELECT min(m.seg) AS seg, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CASE WHEN collate(m.seg, 'UTF8_LCASE') = 'building'
                                THEN 1 ELSE 0 END) AS BIGINT) AS n_building
           FROM mixed m JOIN dim d
             ON collate(m.seg, 'UTF8_LCASE') = collate(d.seg_l, 'UTF8_LCASE')
           GROUP BY collate(m.seg, 'UTF8_LCASE')""") },
      Some("""WITH mixed AS (
             |  SELECT c_custkey,
             |         CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
             |              ELSE lower(c_mktsegment) END AS seg
             |  FROM customer),
             |dim AS (SELECT DISTINCT lower(c_mktsegment) AS seg_l FROM customer)
             |SELECT min(m.seg) AS seg, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CASE WHEN lower(m.seg) = 'building'
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_building
             |FROM mixed m JOIN dim d ON lower(m.seg) = d.seg_l
             |GROUP BY lower(m.seg)""".stripMargin)),

    // variant_explode (Spark 4): the table-valued flatten for VARIANT —
    // arrays explode to (pos, value) rows, objects to (pos, key, value)
    // — completing q76's scalar-path tier with the row-generating one.
    // Arrays are synthesized closed-form from events columns; the object
    // side explodes the fixture's REAL JSON column (events.props). The
    // oracle re-derives array elements positionally and the object
    // entries with DuckDB's json functions.
    "q80_variant_explode" -> Q(
      (s, d) => { views(s, d); s.sql(
        """WITH src AS (
             SELECT event_id,
                    parse_json(concat('[', CAST(floor(value * 100 + 0.5) AS BIGINT),
                                      ',', CAST(user_id AS STRING),
                                      ',', CAST(event_id % 5 AS STRING), ']')) AS arr,
                    parse_json(props) AS obj
             FROM events)
           SELECT event_id, 'arr' AS src, v.pos,
                  CAST(NULL AS STRING) AS key, CAST(v.value AS BIGINT) AS ele
           FROM src, LATERAL variant_explode(arr) v
           UNION ALL
           SELECT event_id, 'obj', o.pos, o.key, CAST(o.value AS BIGINT)
           FROM src, LATERAL variant_explode(obj) o""") },
      Some("""WITH arr AS (
             |  SELECT event_id, 'arr' AS src, CAST(u.p AS INT) AS pos,
             |         CAST(NULL AS VARCHAR) AS key,
             |         CASE u.p WHEN 0 THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
             |                  WHEN 1 THEN user_id
             |                  ELSE event_id % 5 END AS ele
             |  FROM events, (SELECT unnest(generate_series(0, 2)) AS p) u
             |)
             |SELECT event_id, src, pos, key, ele FROM arr
             |UNION ALL
             |SELECT event_id, 'obj', 0, 'k',
             |       CAST(json_extract_string(props, '$.k') AS BIGINT)
             |FROM events""".stripMargin)),

    // SQL session variables (DECLARE/SET VAR) + IDENTIFIER() templating
    // (Spark 4): the in-SQL parameterization story next to the engine's
    // own {var} interpolation (A6/A20) — table name resolved from a
    // variable via IDENTIFIER (safe templating, no string splicing) and
    // a threshold variable read after SET VAR overrides its DEFAULT.
    // Variables fold to literals at plan time, so this is pure surface;
    // the oracle runs the resolved query.
    "q81_sql_variables" -> Q(
      (s, d) => { views(s, d)
        s.sql("DECLARE OR REPLACE VARIABLE graft_tbl STRING DEFAULT 'lineitem'")
        s.sql("DECLARE OR REPLACE VARIABLE graft_qty_lo INT DEFAULT 10")
        s.sql("SET VAR graft_qty_lo = 20")
        s.sql(
        """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
           FROM IDENTIFIER(graft_tbl)
           WHERE l_quantity >= graft_qty_lo
           GROUP BY l_returnflag""") },
      Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
             |FROM lineitem
             |WHERE l_quantity >= 20
             |GROUP BY l_returnflag""".stripMargin)),

    // EXECUTE IMMEDIATE (Spark 4): dynamic SQL from a string with
    // USING-bound parameter markers — the safe form of the build-a-query
    // string every config-driven ETL eventually wants (q81's variables
    // carry the TEXT; binding is by marker, no value splicing). The
    // oracle runs the resolved statement.
    "q82_execute_immediate" -> Q(
      (s, d) => { views(s, d)
        s.sql("""DECLARE OR REPLACE VARIABLE graft_stmt STRING DEFAULT
                 'SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
                         CAST(max(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS max_cents
                  FROM orders WHERE o_orderstatus = ? GROUP BY o_orderpriority'""")
        s.sql("EXECUTE IMMEDIATE graft_stmt USING 'F'") },
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             |       CAST(max(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS max_cents
             |FROM orders WHERE o_orderstatus = 'F'
             |GROUP BY o_orderpriority""".stripMargin)),

    // Parameterized spark.sql (named parameter markers bound through
    // the API, Spark 3.4+/4): the injection-safe programmatic
    // counterpart of q82's in-SQL form — :markers bound from a Scala
    // map, never spliced into the text. The oracle runs the resolved
    // query.
    "q83_parameterized_sql" -> Q(
      (s, d) => { views(s, d)
        s.sql(
          """SELECT l_linestatus, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS net_cents
             FROM lineitem
             WHERE l_quantity BETWEEN :lo AND :hi AND l_returnflag = :flag
             GROUP BY l_linestatus""",
          Map("lo" -> 15, "hi" -> 35, "flag" -> "R")) },
      Some("""SELECT l_linestatus, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS net_cents
             |FROM lineitem
             |WHERE l_quantity BETWEEN 15 AND 35 AND l_returnflag = 'R'
             |GROUP BY l_linestatus""".stripMargin)),

    // schema_of_variant_agg (Spark 4): the drift-MONITORING aggregate —
    // the merged variant schema per partition of a raw JSON corpus, the
    // dashboard query that tells an ingest owner what shapes a feed
    // actually carries (q76 extracts; this one inventories). Over the
    // q76 drift corpus the merged schema per shape is closed-form, so
    // the oracle states the exact schema STRINGS (null maps to VOID,
    // keys sort alphabetically, JSON integers widen to BIGINT).
    "q84_variant_schema_agg" -> Q(
      (s, d) => { views(s, d); s.sql(
        """WITH js AS (
             SELECT o_orderkey % 3 AS shape,
                    CASE o_orderkey % 3
                      WHEN 0 THEN concat('{"id":', CAST(o_orderkey AS STRING),
                                         ',"price_cents":', CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS STRING),
                                         ',"cust":{"seg":"', o_orderpriority, '"}}')
                      WHEN 1 THEN concat('{"id":', CAST(o_orderkey AS STRING),
                                         ',"price_cents":', CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS STRING),
                                         ',"tags":["t0","t', CAST(o_orderkey % 7 AS STRING), '"]}')
                      ELSE concat('{"id":', CAST(o_orderkey AS STRING), ',"extra":null}')
                    END AS j
             FROM orders)
           SELECT shape, CAST(count(*) AS BIGINT) AS n,
                  schema_of_variant_agg(parse_json(j)) AS merged_schema
           FROM js GROUP BY shape""") },
      Some("""SELECT o_orderkey % 3 AS shape, CAST(count(*) AS BIGINT) AS n,
             |       CASE o_orderkey % 3
             |         WHEN 0 THEN 'OBJECT<cust: OBJECT<seg: STRING>, id: BIGINT, price_cents: BIGINT>'
             |         WHEN 1 THEN 'OBJECT<id: BIGINT, price_cents: BIGINT, tags: ARRAY<STRING>>'
             |         ELSE 'OBJECT<extra: VOID, id: BIGINT>'
             |       END AS merged_schema
             |FROM orders GROUP BY o_orderkey % 3""".stripMargin)),

    // EXACT global percentiles over an unbounded numeric column via
    // sketch-bracketed two-phase selection (Munro-Paterson): one GK
    // sketch pass yields per-quantile value brackets PROVABLY containing
    // the exact rank-r element, one pass counts exact offsets, and each
    // ~0.06% bracket sliver goes through the B18 scale-safe numbering —
    // never a global sort, never percentile()'s per-distinct-value
    // state. The sketch value itself never reaches the output, so the
    // result is engine-independent: the oracle picks the same ranks off
    // a plain row_number.
    "q85_exact_percentiles" -> Q(
      (s, d) => graft.operators.GlobalSort.exactPercentiles(
        t(s, d, "lineitem"), col("l_extendedprice"), Seq(0.5, 0.9, 0.99)),
      Some("""WITH v AS (
             |  SELECT l_extendedprice AS v FROM lineitem WHERE l_extendedprice IS NOT NULL
             |), n AS (SELECT count(*) AS n FROM v
             |), r AS (
             |  -- q as DOUBLE: a bare VALUES decimal would render 0.50
             |  SELECT CAST(q AS DOUBLE) AS q,
             |         CAST(floor(CAST(q AS DOUBLE) * (n - 1)) AS BIGINT) + 1 AS rank
             |  FROM n, (VALUES (0.5), (0.9), (0.99)) t(q)
             |), s AS (
             |  SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v
             |)
             |SELECT r.q, s.v AS value, r.rank
             |FROM r JOIN s ON s.rn = r.rank""".stripMargin)),

    // q85 PER GROUP — exact per-flag price percentiles as ONE lazy
    // plan: per-group GK brackets derived columnarly, broadcast
    // |groups|·|qs| targets, one tagged corpus pass for offsets +
    // slivers, a (group, q)-partitioned sliver sort. The oracle picks
    // identical per-group ranks off a partitioned row_number.
    "q86_group_percentiles" -> Q(
      (s, d) => graft.operators.GlobalSort.exactPercentilesByGroup(
        t(s, d, "lineitem"), "l_returnflag", col("l_extendedprice"),
        Seq(0.5, 0.99)),
      Some("""WITH v AS (
             |  SELECT l_returnflag, l_extendedprice AS v FROM lineitem
             |  WHERE l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL
             |), n AS (
             |  SELECT l_returnflag, count(*) AS n FROM v GROUP BY l_returnflag
             |), r AS (
             |  SELECT l_returnflag, CAST(q AS DOUBLE) AS q,
             |         CAST(floor(CAST(q AS DOUBLE) * (n - 1)) AS BIGINT) + 1 AS rank
             |  FROM n, (VALUES (0.5), (0.99)) t(q)
             |), s AS (
             |  SELECT l_returnflag, v,
             |         row_number() OVER (PARTITION BY l_returnflag ORDER BY v) AS rn
             |  FROM v
             |)
             |SELECT r.l_returnflag, r.q, s.v AS value, r.rank
             |FROM r JOIN s ON s.l_returnflag = r.l_returnflag AND s.rn = r.rank""".stripMargin)),

    // Interval union (gaps-and-islands): merge each user's overlapping
    // activity intervals [ts, ts + dur) and report the exact union —
    // the coverage/uptime/session-dedup shape that a naive sum(dur)
    // double-counts wherever intervals overlap. Duration is an integer-
    // seconds function of event_id (no float arithmetic anywhere); all
    // work happens in epoch MICROSECONDS (both engines' exact common
    // precision for the nano fixture). One window over one sort per
    // user partition (island flag = start beyond the running max end;
    // island id = running sum of flags — per-user state, never global),
    // then two hash aggregations. Total order (start, end, event_id) —
    // event_id is unique, so both engines see the identical sequence.
    "q87_interval_merge" -> Q(
      (s, d) => {
        val iv = t(s, d, "events")
          .filter(col("user_id").isNotNull && col("ts").isNotNull)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("start_us"),
            (unix_micros(col("ts")) +
              (col("event_id") % 300 + 30) * lit(1000000L)).as("end_us"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("start_us"), col("end_us"), col("event_id"))
        val prevMax = max(col("end_us"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1))
        val islands = iv
          .withColumn("new_island",
            when(prevMax.isNull || col("start_us") > prevMax, 1L)
              .otherwise(0L))
          .withColumn("island", sum(col("new_island"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("island"))
          .agg(min(col("start_us")).as("i_start"),
            max(col("end_us")).as("i_end"),
            count(lit(1)).as("n_ev"))
        islands.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_islands"),
            sum(col("n_ev")).as("n_events"),
            sum(col("i_end") - col("i_start")).as("covered_us"),
            max(col("i_end") - col("i_start")).as("max_island_us"))
      },
      Some("""WITH iv AS (
             |  SELECT user_id, event_id,
             |         epoch_ns(ts) // 1000 AS start_us,
             |         epoch_ns(ts) // 1000 + (event_id % 300 + 30) * 1000000 AS end_us
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
             |), f AS (
             |  SELECT user_id, event_id, start_us, end_us,
             |         CASE WHEN start_us > coalesce(max(end_us) OVER (
             |                PARTITION BY user_id ORDER BY start_us, end_us, event_id
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |                -9223372036854775808)
             |              THEN 1 ELSE 0 END AS new_island
             |  FROM iv
             |), g AS (
             |  SELECT user_id, start_us, end_us,
             |         sum(new_island) OVER (
             |           PARTITION BY user_id ORDER BY start_us, end_us, event_id
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
             |  FROM f
             |), isl AS (
             |  SELECT user_id, island, min(start_us) AS i_start,
             |         max(end_us) AS i_end, count(*) AS n_ev
             |  FROM g GROUP BY 1, 2
             |)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
             |       CAST(sum(n_ev) AS BIGINT) AS n_events,
             |       CAST(sum(i_end - i_start) AS BIGINT) AS covered_us,
             |       CAST(max(i_end - i_start) AS BIGINT) AS max_island_us
             |FROM isl GROUP BY user_id""".stripMargin)),

    // Cohort retention matrix: users grouped by first-seen epoch-day,
    // per-offset distinct-active counts and the integer retention rate.
    // Day indices are pure integer arithmetic on epoch microseconds
    // (no date_trunc — engines disagree on week boundaries); the
    // cohort assignment is one min-per-user aggregation joined back on
    // the user key (both sides user-partitioned, map-side combined).
    "q88_cohort_retention" -> Q(
      (s, d) => {
        val ev = t(s, d, "events")
          .filter(col("user_id").isNotNull && col("ts").isNotNull)
          .select(col("user_id"),
            expr("unix_micros(ts) DIV 86400000000").as("day"))
        val first = ev.groupBy(col("user_id"))
          .agg(min(col("day")).as("cohort_day"))
        val cohortSize = first.groupBy(col("cohort_day"))
          .agg(countDistinct(col("user_id")).as("cohort_size"))
        ev.join(first, "user_id")
          .groupBy(col("cohort_day"),
            (col("day") - col("cohort_day")).as("day_offset"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          .join(cohortSize, "cohort_day")
          .select(col("cohort_day"), col("day_offset"), col("n_active"),
            col("cohort_size"),
            expr("CAST((1000 * n_active) DIV cohort_size AS BIGINT)")
              .as("retention_milli"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, (epoch_ns(ts) // 1000) // 86400000000 AS day
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
             |), first AS (
             |  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1
             |), cs AS (
             |  SELECT cohort_day, count(DISTINCT user_id) AS cohort_size
             |  FROM first GROUP BY 1
             |), act AS (
             |  SELECT f.cohort_day, ev.day - f.cohort_day AS day_offset,
             |         count(DISTINCT ev.user_id) AS n_active
             |  FROM ev JOIN first f USING (user_id) GROUP BY 1, 2
             |)
             |SELECT a.cohort_day, a.day_offset,
             |       CAST(a.n_active AS BIGINT) AS n_active,
             |       CAST(cs.cohort_size AS BIGINT) AS cohort_size,
             |       CAST((1000 * a.n_active) // cs.cohort_size AS BIGINT) AS retention_milli
             |FROM act a JOIN cs USING (cohort_day)""".stripMargin)),

    // First-touch funnel: signup -> view -> click -> purchase, a user
    // advancing a stage only if its FIRST occurrence of the next event
    // is strictly after the first occurrence of the previous one. One
    // conditional min-per-user aggregation (map-side combined, no
    // window, no self-join), then a single global roll-up — the
    // all-in-one-pass funnel shape that survives any corpus size.
    "q89_funnel" -> Q(
      (s, d) => {
        val m = t(s, d, "events")
          .filter(col("user_id").isNotNull && col("ts").isNotNull)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .groupBy(col("user_id"))
          .agg(min(when(col("event_type") === "signup", col("us"))).as("t1"),
            min(when(col("event_type") === "view", col("us"))).as("t2"),
            min(when(col("event_type") === "click", col("us"))).as("t3"),
            min(when(col("event_type") === "purchase", col("us"))).as("t4"))
        val reached = m.select(
          when(col("t1").isNull, 0L)
            .when(col("t2").isNull || col("t2") <= col("t1"), 1L)
            .when(col("t3").isNull || col("t3") <= col("t2"), 2L)
            .when(col("t4").isNull || col("t4") <= col("t3"), 3L)
            .otherwise(4L).as("reached"))
        reached.agg(
          count(lit(1)).as("n_users"),
          sum(when(col("reached") >= 1, 1L).otherwise(0L)).as("n_signup"),
          sum(when(col("reached") >= 2, 1L).otherwise(0L)).as("n_view"),
          sum(when(col("reached") >= 3, 1L).otherwise(0L)).as("n_click"),
          sum(when(col("reached") >= 4, 1L).otherwise(0L)).as("n_purchase"))
          .select(col("n_users"), col("n_signup"), col("n_view"),
            col("n_click"), col("n_purchase"),
            expr("CAST(CASE WHEN n_signup = 0 THEN NULL ELSE (1000 * n_purchase) DIV n_signup END AS BIGINT)")
              .as("conv_milli"))
      },
      Some("""WITH m AS (
             |  SELECT user_id,
             |         min(CASE WHEN event_type = 'signup' THEN epoch_ns(ts) // 1000 END) AS t1,
             |         min(CASE WHEN event_type = 'view' THEN epoch_ns(ts) // 1000 END) AS t2,
             |         min(CASE WHEN event_type = 'click' THEN epoch_ns(ts) // 1000 END) AS t3,
             |         min(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) // 1000 END) AS t4
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
             |  GROUP BY user_id
             |), r AS (
             |  SELECT CASE WHEN t1 IS NULL THEN 0
             |              WHEN t2 IS NULL OR t2 <= t1 THEN 1
             |              WHEN t3 IS NULL OR t3 <= t2 THEN 2
             |              WHEN t4 IS NULL OR t4 <= t3 THEN 3
             |              ELSE 4 END AS reached
             |  FROM m
             |)
             |SELECT CAST(count(*) AS BIGINT) AS n_users,
             |       CAST(sum(CASE WHEN reached >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
             |       CAST(sum(CASE WHEN reached >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
             |       CAST(sum(CASE WHEN reached >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
             |       CAST(sum(CASE WHEN reached >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
             |       CAST(CASE WHEN sum(CASE WHEN reached >= 1 THEN 1 ELSE 0 END) = 0 THEN NULL
             |            ELSE (1000 * sum(CASE WHEN reached >= 4 THEN 1 ELSE 0 END))
             |                 // sum(CASE WHEN reached >= 1 THEN 1 ELSE 0 END) END AS BIGINT) AS conv_milli
             |FROM r""".stripMargin)),

    // Markov transition matrix over the per-user event sequence: for
    // each (from_type, to_type), the exact successor count and the
    // integer milli-probability P(to | from). One window pass
    // partitioned BY USER (lead over (ts, event_id) — a provably-total
    // order, event_id is unique), then a map-side-combined groupBy: no
    // self-join, no global sort, user partitions scale out.
    "q90_transitions" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val pairs = t(s, d, "events")
          .filter(col("user_id").isNotNull && col("ts").isNotNull)
          .select(col("event_type").as("from_type"),
            lead(col("event_type"), 1).over(w).as("to_type"))
          .filter(col("to_type").isNotNull)
        val counts = pairs.groupBy(col("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        counts
          .withColumn("from_total",
            sum(col("n")).over(Window.partitionBy(col("from_type"))))
          .select(col("from_type"), col("to_type"), col("n"),
            col("from_total"),
            expr("CAST((1000 * n) DIV from_total AS BIGINT)").as("p_milli"))
      },
      Some("""WITH p AS (
             |  SELECT event_type AS from_type,
             |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
             |), c AS (
             |  SELECT from_type, to_type, count(*) AS n FROM p
             |  WHERE to_type IS NOT NULL GROUP BY 1, 2
             |)
             |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
             |       CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS from_total,
             |       CAST((1000 * n) // sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS p_milli
             |FROM c""".stripMargin)),

    // Conversion CURVE: q93's 7-day window unrolled by day offset — for
    // each day 0..7 since first signup, the exact converted count and
    // the cumulative integer-milli conversion. The 8-row day spine is
    // generated (days with zero conversions still report), cumulated by
    // an 8-row window; the signup total rides a 1-row broadcast.
    "q95_conversion_curve" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = t(s, d, "events")
          .filter(col("user_id").isNotNull && col("ts").isNotNull)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val signed = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
        val conv = ev.filter(col("event_type") === "purchase")
          .join(signed, "user_id")
          .filter(col("us") > col("t1") &&
            col("us") <= col("t1") + lit(7L * 86400L * 1000000L))
          .groupBy(col("user_id"), col("t1")).agg(min(col("us")).as("tp"))
        val cnt = conv
          .select(expr("(tp - t1) DIV 86400000000").as("day_offset"))
          .groupBy(col("day_offset")).agg(count(lit(1)).as("n"))
        val spine = s.range(0, 8).toDF("day_offset")
        val tot = signed.agg(count(lit(1)).as("n_signup"))
        spine.join(cnt, Seq("day_offset"), "left")
          .select(col("day_offset"),
            coalesce(col("n"), lit(0L)).as("n_converted"))
          .withColumn("n_converted_cum", sum(col("n_converted")).over(
            Window.orderBy(col("day_offset"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .crossJoin(broadcast(tot))
          .select(col("day_offset"), col("n_converted"),
            col("n_converted_cum"), col("n_signup"),
            expr("CAST((1000 * n_converted_cum) DIV n_signup AS BIGINT)")
              .as("conv_cum_milli"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
             |), signed AS (
             |  SELECT user_id, min(us) AS t1 FROM ev
             |  WHERE event_type = 'signup' GROUP BY 1
             |), conv AS (
             |  SELECT e.user_id, s.t1, min(e.us) AS tp
             |  FROM ev e JOIN signed s USING (user_id)
             |  WHERE e.event_type = 'purchase'
             |    AND e.us > s.t1 AND e.us <= s.t1 + 604800000000
             |  GROUP BY 1, 2
             |), cnt AS (
             |  SELECT (tp - t1) // 86400000000 AS day_offset, count(*) AS n
             |  FROM conv GROUP BY 1
             |), spine AS (SELECT unnest(generate_series(0, 7)) AS day_offset
             |), tot AS (SELECT count(*) AS n_signup FROM signed)
             |SELECT CAST(s.day_offset AS BIGINT) AS day_offset,
             |       CAST(coalesce(c.n, 0) AS BIGINT) AS n_converted,
             |       CAST(sum(coalesce(c.n, 0)) OVER (ORDER BY s.day_offset) AS BIGINT) AS n_converted_cum,
             |       CAST(t.n_signup AS BIGINT) AS n_signup,
             |       CAST((1000 * sum(coalesce(c.n, 0)) OVER (ORDER BY s.day_offset)) // t.n_signup AS BIGINT) AS conv_cum_milli
             |FROM spine s LEFT JOIN cnt c USING (day_offset), tot t""".stripMargin)),

    // LAST-TOUCH attribution: each purchase credits the latest
    // preceding non-purchase event within 7 days (else 'direct') — the
    // marketing-attribution shape. One user-partitioned running
    // `last(..., ignoreNulls)` over the provably-total (us, event_id)
    // order carries the candidate touch; no self-join of the stream.
    "q94_attribution" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = t(s, d, "events")
          .filter(col("user_id").isNotNull && col("ts").isNotNull)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val touched = ev.withColumn("prev",
          last(when(col("event_type") =!= "purchase",
            struct(col("us").as("pus"), col("event_type").as("ptype"))),
            ignoreNulls = true).over(w))
        val channels = touched.filter(col("event_type") === "purchase")
          .select(when(col("prev").isNotNull &&
              col("prev.pus") >= col("us") - lit(7L * 86400L * 1000000L),
              col("prev.ptype"))
            .otherwise(lit("direct")).as("channel"))
          .groupBy(col("channel")).agg(count(lit(1)).as("n_purchases"))
        channels.select(col("channel"), col("n_purchases"),
          expr("CAST((1000 * n_purchases) DIV sum(n_purchases) OVER () AS BIGINT)")
            .as("share_milli"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS us
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
             |), p AS (
             |  SELECT user_id, us, event_type,
             |         last_value(CASE WHEN event_type <> 'purchase' THEN us END IGNORE NULLS)
             |           OVER (PARTITION BY user_id ORDER BY us, event_id
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pus,
             |         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
             |           OVER (PARTITION BY user_id ORDER BY us, event_id
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ptype
             |  FROM ev
             |), a AS (
             |  SELECT CASE WHEN pus IS NOT NULL AND pus >= us - 604800000000
             |              THEN ptype ELSE 'direct' END AS channel
             |  FROM p WHERE event_type = 'purchase'
             |), c AS (SELECT channel, count(*) AS n_purchases FROM a GROUP BY 1)
             |SELECT channel, CAST(n_purchases AS BIGINT) AS n_purchases,
             |       CAST((1000 * n_purchases) // sum(n_purchases) OVER () AS BIGINT) AS share_milli
             |FROM c""".stripMargin)),

    // Time-BOUNDED conversion: of the users who signed up, how many
    // purchased within 7 days of their FIRST signup (q89 is the
    // unbounded ordering funnel; real conversion reporting is always
    // windowed). Two-phase: per-user first-signup frame, then one join
    // back + conditional min — no window function, no self-join of the
    // full event stream; mean time-to-convert in exact integer micros.
    "q93_windowed_funnel" -> Q(
      (s, d) => {
        val ev = t(s, d, "events")
          .filter(col("user_id").isNotNull && col("ts").isNotNull)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val signed = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
        val conv = ev.filter(col("event_type") === "purchase")
          .join(signed, "user_id")
          .filter(col("us") > col("t1") &&
            col("us") <= col("t1") + lit(7L * 86400L * 1000000L))
          .groupBy(col("user_id"), col("t1"))
          .agg(min(col("us")).as("tp"))
        signed.join(conv.select(col("user_id"), col("tp"), col("t1").as("t1c")),
            Seq("user_id"), "left")
          .agg(count(lit(1)).as("n_signup"),
            count(col("tp")).as("n_purchase_7d"),
            sum(col("tp") - col("t1c")).as("__sum_ttc"))
          .select(col("n_signup"), col("n_purchase_7d"),
            expr("CAST((1000 * n_purchase_7d) DIV n_signup AS BIGINT)")
              .as("conv_milli"),
            expr("CAST(CASE WHEN n_purchase_7d = 0 THEN NULL ELSE __sum_ttc DIV n_purchase_7d END AS BIGINT)")
              .as("ttc_mean_us"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
             |), signed AS (
             |  SELECT user_id, min(us) AS t1 FROM ev
             |  WHERE event_type = 'signup' GROUP BY 1
             |), conv AS (
             |  SELECT e.user_id, s.t1, min(e.us) AS tp
             |  FROM ev e JOIN signed s USING (user_id)
             |  WHERE e.event_type = 'purchase'
             |    AND e.us > s.t1 AND e.us <= s.t1 + 604800000000
             |  GROUP BY 1, 2
             |)
             |SELECT CAST(count(*) AS BIGINT) AS n_signup,
             |       CAST(count(c.tp) AS BIGINT) AS n_purchase_7d,
             |       CAST((1000 * count(c.tp)) // count(*) AS BIGINT) AS conv_milli,
             |       CAST(CASE WHEN count(c.tp) = 0 THEN NULL
             |            ELSE sum(c.tp - c.t1) // count(c.tp) END AS BIGINT) AS ttc_mean_us
             |FROM signed s LEFT JOIN conv c USING (user_id)""".stripMargin)),

    // Top-20 session PATHS: gap-sessionize (30-min silence breaks a
    // session; one user-partitioned window over the provably-total
    // (us, event_id) order), render each session's first 8 event types
    // as a '>'-joined path (the cap bounds the group key — an unbounded
    // path string is attacker-sized at 100 TB), then a map-side-combined
    // path count and a WindowGroupLimit top-k. The path-analysis shape
    // behind "what do users actually do": no self-join, no global sort
    // except the 20-row final rank.
    "q92_session_paths" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = t(s, d, "events")
          .filter(col("user_id").isNotNull && col("ts").isNotNull)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val sessed = ev
          .withColumn("brk",
            when(col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1L)
              .otherwise(lit(0L)))
          .withColumn("sess", sum(col("brk")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val paths = sessed
          .groupBy(col("user_id"), col("sess"))
          .agg(concat_ws(">", slice(transform(
            array_sort(collect_list(struct(col("us"), col("event_id"),
              col("event_type")))), e => e("event_type")), 1, 8)).as("path"))
        paths.groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("n_sessions").desc, col("path"))))
          .filter(col("rnk") <= 20)
          .select(col("rnk").cast("long").as("rnk"), col("path"),
            col("n_sessions"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS us
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
             |), f AS (
             |  SELECT *, CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
             |                      > 1800000000 THEN 1 ELSE 0 END AS brk
             |  FROM ev
             |), s AS (
             |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
             |  FROM f
             |), p AS (
             |  SELECT user_id, sess,
             |         array_to_string((list(event_type ORDER BY us, event_id))[1:8], '>') AS path
             |  FROM s GROUP BY 1, 2
             |), c AS (SELECT path, count(*) AS n_sessions FROM p GROUP BY 1)
             |SELECT CAST(rnk AS BIGINT) AS rnk, path, CAST(n_sessions AS BIGINT) AS n_sessions
             |FROM (SELECT path, n_sessions,
             |             row_number() OVER (ORDER BY n_sessions DESC, path) AS rnk
             |      FROM c)
             |WHERE rnk <= 20""".stripMargin)),

    // Value-bounded RANGE frame: each event's trailing 5-minute window
    // (count + integer-cents sum) per user — the rate-limit / rolling-
    // spend / burst-detection shape. A RANGE frame is defined by ORDER
    // KEY VALUES (all peers share one result), so ties in the derived
    // microsecond key cannot make the output engine-specific — no
    // unique tiebreaker needed, unlike every ROWS frame in this file.
    // One user-partitioned sort, no self-join (the naive form is an
    // interval self-join: events ⋈ events on [us-300s, us] — quadratic
    // per hot user; the frame is the same result at sort cost).
    "q91_moving_window" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = t(s, d, "events")
          .filter(col("user_id").isNotNull && col("ts").isNotNull)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
          .rangeBetween(-300000000L, Window.currentRow)
        ev.select(col("user_id"), col("event_id"), col("us"),
          count(lit(1)).over(w).as("n_5min"),
          sum(col("cents")).over(w).as("sum_cents_5min"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us,
             |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
             |)
             |SELECT user_id, event_id, us,
             |       CAST(count(*) OVER w AS BIGINT) AS n_5min,
             |       CAST(sum(cents) OVER w AS BIGINT) AS sum_cents_5min
             |FROM ev
             |WINDOW w AS (PARTITION BY user_id ORDER BY us
             |             RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)""".stripMargin))
  )
}
