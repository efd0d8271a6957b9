package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Q, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries` is assembled from the per-tier suites:
  *   - [[graft.queries.Relational]]: SURVEY §2B rows B1–B33
  *   - [[graft.queries.Framework]]: SURVEY §2A engine lifecycle (A1–A20)
  *   - [[graft.queries.Extensions]]: LLM-pipeline tier (dedup, similarity,
  *     text analysis, multimodal)
  *   - [[graft.queries.TpcH]]: the canonical TPC-H 22-query battery
  */
object SparkEntry {

  private def suites: Seq[(String, Q)] =
    Relational.all ++ graft.queries.Framework.all ++
      graft.queries.Extensions.all ++ graft.queries.StreamingQueries.all ++
      graft.queries.TpcH.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * README Example-1 shape: revenue per region across the full join graph. */
  def entry(spark: SparkSession): DataFrame =
    Relational.all.collectFirst { case ("q03_join_inner", q) => q }
      .get.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    suites.map { case (n, q) => n -> q.fn }.toMap

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops (approx
    * sketches, sampling, LSH candidates) → rows-only check. */
  def oracleSql: Map[String, String] =
    suites.collect { case (n, Q(_, Some(sql))) => n -> sql.stripMargin }.toMap
}
