package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.ConfigParser
import graft.engine.Engine

/** Engine-lifecycle proof queries — SURVEY §2A (reference
  * `glue/glue_etl_framework.py:136-275`). Each `fw_*` entry drives the
  * REAL engine end to end: YAML text → ConfigParser → Engine.runSparkSqlJob
  * (sources → temp views → spark.sql → Sinks) → read the sink output back
  * and return it. The DuckDB oracle runs the equivalent plain SQL over the
  * same parquet fixtures, so a hash match proves the whole lifecycle —
  * not just the query — produced the right bytes.
  *
  * Coverage map: A1 file scan incl. csv+options (fw_lifecycle), A2/A14
  * catalog source+sink (fw_catalog), A3 real JDBC (fw_jdbc), A4/A5 views +
  * SQL dispatch (all), A6/A20 var interpolation in locations+SQL
  * (fw_lifecycle, fw_sql_file), A7 SQL-from-file (fw_sql_file), A8/A9
  * repartition/coalesce + Q10 precedence (fw_filecount), A10 partitioned
  * write (fw_lifecycle), A12/A16 dynamic partition overwrite
  * (fw_dyn_overwrite), A13 incremental append (fw_incremental), A17 script
  * job (fw_script), A22 bookmark store (fw_bookmark), streaming drain with
  * exactly-once re-run (fw_stream), json/orc format matrix (fw_formats).
  */
object Framework {

  /** Per-query scratch root, keyed by sf dir so sf0.001 smoke and sf0.01
    * verify runs never share state. */
  private def scratch(dir: String, name: String): String = {
    val sf = dir.replaceAll("[^A-Za-z0-9]", "_")
    s"/tmp/graft-fw/$sf/$name"
  }

  private def rmrf(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  private def run(spark: SparkSession, yaml: String, pipeline: String = "default",
                  extraVars: Map[String, String] = Map.empty): Unit = {
    val job = ConfigParser.parse(yaml)
    Engine.runSparkSqlJob(spark, job, pipeline, extraVars)
  }

  /** README Example-1 shape through the full lifecycle: a csv input WITH
    * Glue-named format options (withHeader/separator → header/sep), three
    * parquet inputs, `{var}` interpolation in locations AND SQL, 4-way
    * join + agg, partitioned full-refresh parquet sink, read-back.
    * Scale note: region/nation are KB-sized → the SQL hints BROADCAST so
    * the big orders↔customer shuffle is the only exchange. */
  private def fwLifecycle(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "lifecycle")
    rmrf(s, base)
    // stage the csv flavor of region (exercises A1 option mapping)
    s.read.parquet(s"$d/region.parquet")
      .coalesce(1).write.option("header", "true").option("sep", "|").csv(s"$base/region_csv")
    val yaml =
      s"""job:
         |  name: fw-lifecycle
         |  type: spark-sql
         |variables:
         |  default:
         |    sf_dir: $d
         |    min_price: "0"
         |input_tables:
         |  - name: region
         |    source: s3
         |    location: $base/region_csv
         |    format: csv
         |    format_options:
         |      withHeader: "true"
         |      separator: "|"
         |      inferSchema: "true"
         |  - name: nation
         |    source: s3
         |    location: "{sf_dir}/nation.parquet"
         |  - name: customer
         |    source: s3
         |    location: "{sf_dir}/customer.parquet"
         |  - name: orders
         |    source: s3
         |    location: "{sf_dir}/orders.parquet"
         |output_table:
         |  name: revenue_by_region
         |  target: s3
         |  location: $base/out
         |  format: parquet
         |  refresh: full
         |  partition_keys: r_name
         |sql: >
         |  SELECT /*+ BROADCAST(r, n) */ r.r_name,
         |         CAST(count(*) AS BIGINT) AS n_orders,
         |         CAST(sum(floor(o.o_totalprice * 100 + 0.5)) AS BIGINT) AS revenue_cents
         |  FROM orders o
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN nation n ON c.c_nationkey = n.n_nationkey
         |  JOIN region r ON n.n_regionkey = r.r_regionkey
         |  WHERE o.o_totalprice > {min_price}
         |  GROUP BY r.r_name
         |""".stripMargin
    run(s, yaml)
    s.read.parquet(s"$base/out")
      .select(col("r_name"), col("n_orders"), col("revenue_cents"))
  }

  /** A7 + A6: the SELECT loaded from a file (Hadoop FS), `{var}`s resolved
    * inside the file text. */
  private def fwSqlFile(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "sqlfile")
    rmrf(s, base)
    val sqlPath = new org.apache.hadoop.fs.Path(s"$base/query.sql")
    val fs = sqlPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val out = fs.create(sqlPath, true)
    try out.write(
      ("SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations\n" +
       "FROM {table_alias} GROUP BY n_regionkey").getBytes("UTF-8"))
    finally out.close()
    val yaml =
      s"""job:
         |  name: fw-sqlfile
         |  type: spark-sql
         |variables:
         |  default:
         |    table_alias: nation
         |input_tables:
         |  - name: nation
         |    source: s3
         |    location: $d/nation.parquet
         |output_table:
         |  name: sqlfile_out
         |  target: s3
         |  location: $base/out
         |sql_file: $base/query.sql
         |""".stripMargin
    run(s, yaml)
    s.read.parquet(s"$base/out")
  }

  /** A13: full refresh, then an incremental re-run of the same SQL →
    * append, every row exactly twice. */
  private def fwIncremental(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "incremental")
    rmrf(s, base)
    def yaml(refresh: String) =
      s"""job:
         |  name: fw-incremental
         |  type: spark-sql
         |input_tables:
         |  - name: nation
         |    source: s3
         |    location: $d/nation.parquet
         |output_table:
         |  name: inc_out
         |  target: s3
         |  location: $base/out
         |  refresh: $refresh
         |sql: SELECT n_nationkey, n_name FROM nation
         |""".stripMargin
    run(s, yaml("full"))
    run(s, yaml("incremental"))
    s.read.parquet(s"$base/out")
  }

  /** A12/A16: dynamic partition overwrite. Run 1 writes all priorities;
    * run 2 full-refreshes ONLY priority '1-URGENT' rows with price zeroed.
    * If overwrite were static, every other partition would vanish; the
    * oracle asserts they survive with original totals. */
  private def fwDynOverwrite(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "dynoverwrite")
    rmrf(s, base)
    def yaml(where: String, price: String) =
      s"""job:
         |  name: fw-dyn
         |  type: spark-sql
         |input_tables:
         |  - name: orders
         |    source: s3
         |    location: $d/orders.parquet
         |output_table:
         |  name: dyn_out
         |  target: s3
         |  location: $base/out
         |  refresh: full
         |  partition_keys: o_orderpriority
         |sql: >
         |  SELECT o_orderkey, $price AS price_cents, o_orderpriority
         |  FROM orders $where
         |""".stripMargin
    run(s, yaml("", "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
    run(s, yaml("WHERE o_orderpriority = '1-URGENT'", "CAST(0 AS BIGINT)"))
    s.read.parquet(s"$base/out")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), sum(col("price_cents")).as("sum_cents"))
  }

  /** A8/A9 + Appendix Q10: repartition beats coalesce when both are set;
    * coalesce alone narrows without a shuffle. The Spark side measures the
    * REAL output file counts; the oracle pins the expected constants. */
  private def fwFilecount(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "filecount")
    rmrf(s, base)
    def yaml(out: String, shape: String, sql: String) =
      s"""job:
         |  name: fw-filecount
         |  type: spark-sql
         |input_tables:
         |  - name: customer
         |    source: s3
         |    location: $d/customer.parquet
         |output_table:
         |  name: fc_out
         |  target: s3
         |  location: $base/$out
         |$shape
         |sql: $sql
         |""".stripMargin
    run(s, yaml("both", "  repartition: \"3\"\n  coalesce: \"1\"",
      "SELECT c_custkey, c_name FROM customer"))
    // the coalesce run must START wide (32 shuffle partitions from the
    // GROUP BY) for coalesce(2) to be observable — a projection over a
    // single input split would already be 1 partition, and AQE would
    // merge the tiny shuffle back to 1, so pin it off for this run
    val aqeCoalesce = "spark.sql.adaptive.coalescePartitions.enabled"
    val saved = s.conf.get(aqeCoalesce, "true")
    s.conf.set(aqeCoalesce, "false")
    try run(s, yaml("coal", "  coalesce: \"2\"",
      "SELECT c_custkey, CAST(count(*) AS BIGINT) AS n FROM customer GROUP BY c_custkey"))
    finally s.conf.set(aqeCoalesce, saved)
    def nFiles(path: String): Long = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.listStatus(p).count(st => st.getPath.getName.startsWith("part-")).toLong
    }
    import s.implicits._
    Seq(("repartition_wins_files", nFiles(s"$base/both")),
        ("coalesce_files", nFiles(s"$base/coal")))
      .toDF("metric", "value")
  }

  /** A16 as a real row-level merge: full refresh seeds the table, an
    * upsert run replaces every key it carries (marking them v2, zeroing
    * cents) AND inserts a brand-new key; untouched rows must survive
    * verbatim. */
  /** Column-level lineage from the analyzed plan ([[Engine]] A4/A5 +
    * [[graft.engine.Lineage]]): register the job's inputs, resolve its
    * SQL, and report which source columns feed each output column —
    * through aliases, a join, and an aggregate. Driver-side plan
    * analysis; the oracle is the hand-derived lineage of the fixed SQL. */
  private def fwLineage(s: SparkSession, d: String): DataFrame = {
    import graft.config._
    val job = ConfigParser.parse(
      s"""job: {name: fw-lineage, type: spark-sql}
         |input_tables:
         |  - {name: nation, source: s3, location: $d/nation.parquet}
         |  - {name: region, source: s3, location: $d/region.parquet}
         |sql: >
         |  SELECT r.r_name AS region_name, count(*) AS n_nations,
         |    sum(n.n_nationkey + n.n_regionkey) AS key_sum
         |  FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
         |  GROUP BY r.r_name
         |""".stripMargin)
    Engine.registerInputs(s, job, Map.empty, "default")
    val result = s.sql(Engine.resolveSql(s, job, Map.empty))
    val rows = graft.engine.Lineage.columnLineage(result).map {
      case (o, t, c) => org.apache.spark.sql.Row(o, t, c)
    }
    s.createDataFrame(new java.util.ArrayList(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("output_column",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("source_table",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("source_column",
          org.apache.spark.sql.types.StringType))))
  }

  /** Observation metrics on the sink action (`observe_cols`): row count
    * and per-column non-null counts accumulate DURING the write — no
    * second scan — and publish as `_graft_metrics.json` beside the
    * table. The query returns the metrics table; the oracle recomputes
    * the same counts from the source, proving the during-write totals
    * equal a full recount. */
  private def fwObserve(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "observe")
    rmrf(s, base)
    run(s,
      s"""job:
         |  name: fw-observe
         |  type: spark-sql
         |input_tables:
         |  - name: customer
         |    source: s3
         |    location: $d/customer.parquet
         |output_table:
         |  name: obs_out
         |  target: s3
         |  location: $base/out
         |  observe_cols: cents,seg
         |sql: >
         |  SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
         |    CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_mktsegment END AS seg
         |  FROM customer
         |""".stripMargin)
    val txt = Engine.readTextFile(s, s"$base/out/_graft_metrics.json")
    // {"n_rows":N,"nonnull_cents":N,"nonnull_seg":N} -> (metric, value)
    val rows = txt.stripPrefix("{").stripSuffix("}").split(",").toSeq.map { kv =>
      val Array(k, v) = kv.split(":")
      org.apache.spark.sql.Row(k.trim.stripPrefix("\"").stripSuffix("\""), v.trim.toLong)
    }
    s.createDataFrame(new java.util.ArrayList(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("metric",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.LongType))))
  }

  /** A16 extended: the SCD2 history sink. Batch 1 publishes the full
    * snapshot; batch 2 publishes a CHANGED snapshot (every custkey % 10
    * balance zeroed, every custkey % 7 deleted) — the read-back history
    * must show closed v1 rows, open v2 rows, and untouched survivors,
    * with deterministic batch numbers the oracle replays. */
  private def fwScd2(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "scd2")
    rmrf(s, base)
    def yaml(sql: String) =
      s"""job:
         |  name: fw-scd2
         |  type: spark-sql
         |input_tables:
         |  - name: customer
         |    source: s3
         |    location: $d/customer.parquet
         |output_table:
         |  name: scd2_out
         |  target: s3
         |  location: $base/out
         |  refresh: scd2
         |  merge_keys: c_custkey
         |sql: >
         |  $sql
         |""".stripMargin
    run(s, yaml(
      """SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
        |  FROM customer""".stripMargin.replace("\n", " ")))
    run(s, yaml(
      """SELECT c_custkey, CASE WHEN c_custkey % 10 = 0 THEN CAST(0 AS BIGINT)
        |  ELSE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) END AS cents
        |  FROM customer WHERE c_custkey % 7 <> 0""".stripMargin.replace("\n", " ")))
    s.read.parquet(s"$base/out")
  }

  private def fwUpsert(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "upsert")
    rmrf(s, base)
    def yaml(refresh: String, extra: String, sql: String) =
      s"""job:
         |  name: fw-upsert
         |  type: spark-sql
         |input_tables:
         |  - name: customer
         |    source: s3
         |    location: $d/customer.parquet
         |output_table:
         |  name: up_out
         |  target: s3
         |  location: $base/out
         |  refresh: $refresh
         |$extra
         |sql: >
         |  $sql
         |""".stripMargin
    run(s, yaml("full", "",
      """SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
        |  'v1' AS version FROM customer""".stripMargin.replace("\n", " ")))
    run(s, yaml("upsert", "  merge_keys: c_custkey",
      """SELECT c_custkey, CAST(0 AS BIGINT) AS cents, 'v2' AS version
        |  FROM customer WHERE c_custkey % 10 = 0
        |  UNION ALL SELECT CAST(-1 AS BIGINT), CAST(0 AS BIGINT), 'v2'""".stripMargin.replace("\n", " ")))
    s.read.parquet(s"$base/out")
  }

  /** A16 at scale: the PARTITION-PRUNED merge ([[graft.sinks.Sinks]]
    * prunedUpsert) — `refresh: upsert` + `partition_keys` rewrites only
    * the partitions the batch touches. The batch MOVES keys across
    * partitions (every `%10` customer updates into the BUILDING
    * segment), so the merge must both land the new versions in BUILDING
    * and DELETE the stale versions from the segments they left — the
    * key-move leg of the affected-partition computation. The read-back
    * table oracle-checks row-for-row; the untouched-partition
    * file-mtime contract is asserted in SinksSpec (no full read-back
    * can see mtimes). */
  private def fwUpsertPruned(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "upsert_pruned")
    rmrf(s, base)
    def yaml(refresh: String, extra: String, sql: String) =
      s"""job:
         |  name: fw-upsert-pruned
         |  type: spark-sql
         |input_tables:
         |  - name: customer
         |    source: s3
         |    location: $d/customer.parquet
         |output_table:
         |  name: upp_out
         |  target: s3
         |  location: $base/out
         |  refresh: $refresh
         |  partition_keys: c_mktsegment
         |$extra
         |sql: >
         |  $sql
         |""".stripMargin
    run(s, yaml("full", "",
      """SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
        |  'v1' AS version, c_mktsegment FROM customer""".stripMargin.replace("\n", " ")))
    run(s, yaml("upsert", "  merge_keys: c_custkey",
      """SELECT c_custkey, CAST(0 AS BIGINT) AS cents, 'v2' AS version,
        |  'BUILDING' AS c_mktsegment FROM customer WHERE c_custkey % 10 = 0
        |  UNION ALL SELECT CAST(-1 AS BIGINT), CAST(0 AS BIGINT), 'v2', 'BUILDING'""".stripMargin.replace("\n", " ")))
    s.read.parquet(s"$base/out")
      .withColumn("c_mktsegment",
        org.apache.spark.sql.functions.col("c_mktsegment").cast("string"))
  }

  /** A15/A16 upgraded to a real (minimal) table format: three engine runs
    * commit v1 (full = overwrite commit) / v2 (incremental = append
    * commit) / v3 (upsert = snapshot merge + SERIALIZABLE commit)
    * through the versioned-manifest protocol (`versioned: true`); the
    * read-back is the final snapshot. Multi-writer atomicity and
    * snapshot isolation are pinned in VersionedTableSpec; this proves
    * the YAML surface end-to-end. */
  private def fwAcid(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "acid")
    rmrf(s, base)
    runAcidLifecycle(s, d, base)
    graft.sinks.VersionedTable.read(s, s"$base/out")
  }

  /** The SAME acid lifecycle (overwrite → append → merge) published
    * through the [[graft.sinks.LockFileCommitCoordinator]] — the
    * overwrite-only-object-store commit path (no atomic rename, no
    * create-if-absent; lease-style intent election instead). Must land
    * byte-identical results to `fw_acid`: the coordinator changes HOW a
    * manifest wins its version, never WHAT a version contains. The
    * two-writer race itself is pinned in VersionedTableSpec. */
  private def fwLockfileCommit(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "lockfile")
    rmrf(s, base)
    val prev = graft.sinks.VersionedTable.commitCoordinator
    graft.sinks.VersionedTable.setCommitCoordinator(
      new graft.sinks.LockFileCommitCoordinator(20))
    try runAcidLifecycle(s, d, base)
    finally graft.sinks.VersionedTable.setCommitCoordinator(prev)
    require(graft.sinks.VersionedTable.versions(s, s"$base/out") == Seq(1L, 2L, 3L),
      "fw_lockfile_commit: the lifecycle must land exactly v1..v3")
    graft.sinks.VersionedTable.read(s, s"$base/out")
  }

  /** A15's no-partial-output contract on a PLAIN (non-versioned) sink
    * over an overwrite-only store — the default YAML a config user gets,
    * with the process coordinator switched to the lockfile election: the
    * staged swap becomes a generation-pointer publish through the
    * pluggable [[graft.sinks.CommitCoordinator]] (data in a unique
    * `_gen/` dir, visibility via a CAS-won `_graft_ptr/vN.json` — no
    * rename, no create-if-absent anywhere on the publish path). Three
    * runs: full (superseded — its generation must be purged), full (the
    * live base), upsert (whole-table merge resolved through the
    * pointer). Layout postconditions are REQUIREd here; the multi-writer
    * race, crash window, and vacuum TTL contracts are pinned in
    * PointerPublishSpec. The read-back resolves the pointer exactly as
    * the Sources file scan does. */
  private def fwAtomicSink(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "atomic_sink")
    rmrf(s, base)
    val prev = graft.sinks.VersionedTable.commitCoordinator
    graft.sinks.VersionedTable.setCommitCoordinator(
      new graft.sinks.LockFileCommitCoordinator(20))
    try {
      def yaml(refresh: String, extra: String, sql: String) =
        s"""job:
           |  name: fw-atomic-sink
           |  type: spark-sql
           |input_tables:
           |  - name: customer
           |    source: s3
           |    location: $d/customer.parquet
           |output_table:
           |  name: atomic_out
           |  target: s3
           |  location: $base/out
           |  refresh: $refresh
           |$extra
           |sql: >
           |  $sql
           |""".stripMargin
      run(s, yaml("full", "",
        """SELECT c_custkey, CAST(0 AS BIGINT) AS cents, 'v0' AS version
          |  FROM customer WHERE c_custkey % 3 = 0""".stripMargin.replace("\n", " ")))
      run(s, yaml("full", "",
        """SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
          |  'v1' AS version FROM customer""".stripMargin.replace("\n", " ")))
      // pin a reader's resolved path at v2, as a reader that resolved
      // just before the next publish would hold it
      val pinnedAtV2 = graft.sinks.Sinks.resolveDataPath(s, s"$base/out")
      run(s, yaml("upsert", "  merge_keys: c_custkey",
        """SELECT c_custkey, CAST(0 AS BIGINT) AS cents, 'v2' AS version
          |  FROM customer WHERE c_custkey % 10 = 0""".stripMargin.replace("\n", " ")))
      // purge grace (r12 verdict #2): under the default keepGenerations=2
      // the v2 generation survives the v3 publish, so the pinned reader
      // finishes its scan on exactly the snapshot it resolved
      val pinnedVersions = s.read.parquet(pinnedAtV2)
        .select("version").distinct().collect().map(_.getString(0)).toSet
      require(pinnedVersions == Set("v1"),
        s"fw_atomic_sink: a reader pinned on the superseded generation must " +
          s"still see exactly its snapshot under the purge grace, saw $pinnedVersions")
    } finally graft.sinks.VersionedTable.setCommitCoordinator(prev)
    val target = new org.apache.hadoop.fs.Path(s"$base/out")
    val fs = target.getFileSystem(s.sparkContext.hadoopConfiguration)
    val ptrs = fs.listStatus(new org.apache.hadoop.fs.Path(target, "_graft_ptr"))
      .map(_.getPath.getName).sorted
    require(ptrs.sameElements(Array("v000000000002.json", "v000000000003.json")),
      s"fw_atomic_sink: three publishes under keepGenerations=2 must leave " +
        s"pointers v2+v3: ${ptrs.mkString(",")}")
    require(fs.listStatus(new org.apache.hadoop.fs.Path(target, "_gen")).length == 2,
      "fw_atomic_sink: generations beyond the keep-2 grace must be purged, " +
        "the graced one retained")
    require(fs.listStatus(target).map(_.getPath.getName).toSet == Set("_gen", "_graft_ptr"),
      "fw_atomic_sink: no plain-layout data may remain at the root")
    s.read.parquet(graft.sinks.Sinks.resolveDataPath(s, s"$base/out"))
  }

  private def runAcidLifecycle(s: SparkSession, d: String, base: String): Unit = {
    def yaml(refresh: String, extra: String, sql: String) =
      s"""job:
         |  name: fw-acid
         |  type: spark-sql
         |input_tables:
         |  - name: customer
         |    source: s3
         |    location: $d/customer.parquet
         |output_table:
         |  name: acid_out
         |  target: s3
         |  location: $base/out
         |  refresh: $refresh
         |  versioned: true
         |$extra
         |sql: >
         |  $sql
         |""".stripMargin
    run(s, yaml("full", "",
      """SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
        |  'v1' AS version FROM customer WHERE c_custkey % 2 = 0""".stripMargin.replace("\n", " ")))
    run(s, yaml("incremental", "",
      """SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
        |  'v2' AS version FROM customer WHERE c_custkey % 2 = 1""".stripMargin.replace("\n", " ")))
    run(s, yaml("upsert", "  merge_keys: c_custkey",
      """SELECT c_custkey, CAST(0 AS BIGINT) AS cents, 'v3' AS version
        |  FROM customer WHERE c_custkey % 10 = 0""".stripMargin.replace("\n", " ")))
  }

  /** Row-level DELETE via DELETION VECTORS on the YAML surface: commit
    * the customer projection as v1, run a `maintenance.action: delete`
    * job through the real engine (the debtor purge: cents < 0), then a
    * direct-API delete of one market segment — two accumulated DVs,
    * ZERO data files rewritten (the protocol is pinned in
    * VersionedTableSpec: same file set and bytes, merge/append/compact
    * interplay, vacuum reclamation). The read-back is the final
    * snapshot through the DV anti-join. */
  private def fwDeleteVectors(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "dv")
    rmrf(s, base)
    val loc = s"$base/out"
    val src = s.read.parquet(s"$d/customer.parquet")
      .select(col("c_custkey"),
        expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("cents"),
        col("c_mktsegment"))
    graft.sinks.VersionedTable.commit(s, loc, src, "overwrite",
      statsColumns = Seq("c_custkey"))
    Engine.run(s, ConfigParser.parse(
      s"""job:
         |  name: fw-dv
         |  type: maintenance
         |maintenance:
         |  action: delete
         |  location: $loc
         |  where: cents < 0
         |""".stripMargin), "default")
    graft.sinks.VersionedTable.deleteWhere(s, loc, "c_mktsegment = 'BUILDING'")
    graft.sinks.VersionedTable.read(s, loc)
  }

  /** Row-level UPDATE via deletion vectors on the YAML surface: the
    * [[fwDeleteVectors]] table shape, then `maintenance.action: update`
    * zeroes the balance of one segment (old positions -> DV, updated
    * images appended — one atomic commit, zero files rewritten). */
  private def fwUpdateVectors(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "dvu")
    rmrf(s, base)
    val loc = s"$base/out"
    val src = s.read.parquet(s"$d/customer.parquet")
      .select(col("c_custkey"),
        expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("cents"),
        col("c_mktsegment"))
    graft.sinks.VersionedTable.commit(s, loc, src, "overwrite",
      statsColumns = Seq("c_custkey"))
    Engine.run(s, ConfigParser.parse(
      s"""job:
         |  name: fw-dvu
         |  type: maintenance
         |maintenance:
         |  action: update
         |  location: $loc
         |  where: c_mktsegment = 'MACHINERY'
         |  set:
         |    cents: "cents DIV 2"
         |""".stripMargin), "default")
    graft.sinks.VersionedTable.read(s, loc)
  }

  /** MATERIALIZED VIEW on the YAML surface: a versioned source table,
    * a `materialized: true` output over it, and three engine runs —
    * build (recompute), replay (SKIPPED: the fingerprint of the
    * source's latest version matches the recorded state, so neither the
    * SQL nor the sink runs), source append + replay (recompute). The
    * requires pin the skip: the MV's version log gains nothing on the
    * fresh run. At 100 TB this is a scheduled rollup that answers "no
    * upstream commit since last tick" with directory listings. */
  private def fwMatview(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "matview")
    rmrf(s, base)
    val srcLoc = s"$base/src"
    val mvLoc = s"$base/mv"
    val proj = s.read.parquet(s"$d/customer.parquet")
      .select(col("c_custkey"),
        expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("cents"),
        col("c_mktsegment"))
    graft.sinks.VersionedTable.commit(s, srcLoc,
      proj.filter(col("c_custkey") % 2 === 0), "overwrite")
    def yaml = s"""job:
       |  name: fw-matview
       |  type: spark-sql
       |input_tables:
       |  - name: src
       |    source: s3
       |    location: $srcLoc
       |    versioned: "true"
       |output_table:
       |  name: mv_out
       |  target: s3
       |  location: $mvLoc
       |  versioned: true
       |  materialized: true
       |sql: >
       |  SELECT c_mktsegment, count(*) AS n_cust,
       |  CAST(sum(cents) AS BIGINT) AS total_cents FROM src GROUP BY c_mktsegment
       |""".stripMargin
    run(s, yaml)
    require(graft.sinks.VersionedTable.versions(s, mvLoc) == Seq(1L),
      "fw_matview: first run must materialize v1")
    run(s, yaml) // fresh: must SKIP — no new MV version
    require(graft.sinks.VersionedTable.versions(s, mvLoc) == Seq(1L),
      "fw_matview: replay on an unchanged source must not recompute")
    graft.sinks.VersionedTable.commit(s, srcLoc,
      proj.filter(col("c_custkey") % 2 === 1), "append")
    run(s, yaml) // source moved: recompute
    require(graft.sinks.VersionedTable.versions(s, mvLoc) == Seq(1L, 2L),
      "fw_matview: a source append must invalidate the MV")
    graft.sinks.VersionedTable.read(s, mvLoc)
  }

  /** WRITE-AUDIT-PUBLISH on the YAML surface (zero-copy branches):
    * main v1 -> `create_branch audit` -> a staging append ON THE BRANCH
    * that includes bad rows (negative balances) -> an audit-and-fix job
    * reading the BRANCH head and overwriting the branch with the
    * cleaned frame -> `publish_branch` (serializable fast-forward).
    * The requires pin the isolation: main never sees the staged rows
    * until the publish, and the publish lands exactly one new main
    * version. */
  private def fwWap(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "wap")
    rmrf(s, base)
    val loc = s"$base/out"
    val proj = s.read.parquet(s"$d/customer.parquet")
      .select(col("c_custkey"),
        expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("cents"),
        col("c_mktsegment"))
    graft.sinks.VersionedTable.commit(s, loc,
      proj.filter(col("c_custkey") % 2 === 0 && col("cents") >= 0), "overwrite")
    def maint(action: String) =
      s"""job:
         |  name: fw-wap-$action
         |  type: maintenance
         |maintenance:
         |  action: $action
         |  location: $loc
         |  branch: audit
         |""".stripMargin
    Engine.run(s, ConfigParser.parse(maint("create_branch")), "default")
    // staging append on the branch: the odd half INCLUDING bad rows
    run(s,
      s"""job:
         |  name: fw-wap-stage
         |  type: spark-sql
         |input_tables:
         |  - name: customer
         |    source: s3
         |    location: $d/customer.parquet
         |output_table:
         |  name: wap_out
         |  target: s3
         |  location: $loc
         |  refresh: incremental
         |  versioned: true
         |  branch: audit
         |sql: >
         |  SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
         |  c_mktsegment FROM customer WHERE c_custkey % 2 = 1
         |""".stripMargin)
    // isolation: main is still v1's clean even half
    require(graft.sinks.VersionedTable.versions(s, loc) == Seq(1L),
      "fw_wap: staging on the branch must not commit to main")
    require(graft.sinks.VersionedTable.read(s, loc)
      .filter(col("cents") < 0).isEmpty,
      "fw_wap: main readers must never see the staged bad rows")
    // audit-and-fix: read the BRANCH head, overwrite the branch clean
    run(s,
      s"""job:
         |  name: fw-wap-fix
         |  type: spark-sql
         |input_tables:
         |  - name: staged
         |    source: s3
         |    location: $loc
         |    versioned: "true"
         |    branch: audit
         |output_table:
         |  name: wap_out
         |  target: s3
         |  location: $loc
         |  refresh: full
         |  versioned: true
         |  branch: audit
         |sql: >
         |  SELECT c_custkey, cents, c_mktsegment FROM staged WHERE cents >= 0
         |""".stripMargin)
    Engine.run(s, ConfigParser.parse(maint("publish_branch")), "default")
    require(graft.sinks.VersionedTable.versions(s, loc) == Seq(1L, 2L),
      "fw_wap: the publish must land exactly one new main version")
    graft.sinks.VersionedTable.read(s, loc)
  }

  /** INCREMENTAL VIEW MAINTENANCE: an additive segment rollup over a
    * versioned source — build (full), append the odd half, refresh
    * again: the require pins that the second refresh took the
    * INCREMENTAL path (delta fold over only the appended files), and
    * the oracle proves the fold equals a from-scratch rollup of the
    * whole source. */
  private def fwMatviewInc(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "matview_inc")
    rmrf(s, base)
    val srcLoc = s"$base/src"; val mvLoc = s"$base/mv"
    val proj = s.read.parquet(s"$d/customer.parquet")
      .select(col("c_custkey"),
        expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("cents"),
        col("c_mktsegment"))
    graft.sinks.VersionedTable.commit(s, srcLoc,
      proj.filter(col("c_custkey") % 2 === 0), "overwrite")
    def refresh() = graft.sinks.MaterializedView.refreshAdditive(
      s, mvLoc, "src", srcLoc, Seq("c_mktsegment"),
      Map("total_cents" -> "cents"), countName = Some("n_cust"))
    require(refresh()._2 == "full", "fw_matview_inc: first refresh is full")
    graft.sinks.VersionedTable.commit(s, srcLoc,
      proj.filter(col("c_custkey") % 2 === 1), "append")
    val (_, path) = refresh()
    require(path == "incremental",
      s"fw_matview_inc: append must take the delta path, got '$path'")
    require(refresh()._2 == "fresh", "fw_matview_inc: replay must be fresh")
    graft.sinks.VersionedTable.read(s, mvLoc)
  }

  /** STREAMING write-audit-publish: the streaming drain lands every
    * micro-batch as an exactly-once BRANCH commit (txn-carrying, WAL
    * replays skipped at the table) while main stays pinned at its
    * pre-stream snapshot; after the drain the branch is audited (the
    * require) and published as ONE new main version. The streaming
    * analog of [[fwWap]]: a pipeline can pour a day of micro-batches
    * into a branch and gate the PUBLISH on end-of-day audits, with
    * main readers never seeing a half-drained day. */
  private def fwStreamWap(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "stream_wap")
    rmrf(s, base)
    val loc = s"$base/out"
    s.read.parquet(s"$d/documents.parquet").write.parquet(s"$base/in")
    // main v1: an empty-marker snapshot (the pre-stream state)
    graft.sinks.VersionedTable.commit(s, loc,
      s.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), col("source"), col("n_chars"))
        .limit(0), "overwrite")
    Engine.run(s, ConfigParser.parse(
      s"""job:
         |  name: fw-stream-wap-branch
         |  type: maintenance
         |maintenance:
         |  action: create_branch
         |  location: $loc
         |  branch: ingest
         |""".stripMargin), "default")
    val yaml =
      s"""job:
         |  name: fw-stream-wap
         |  type: spark-sql
         |  streaming: available_now
         |  checkpoint_location: $base/ckpt
         |input_tables:
         |  - name: documents
         |    source: s3
         |    location: $base/in
         |    format: parquet
         |    schema: "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
         |output_table:
         |  name: wap_stream_out
         |  target: s3
         |  location: $loc
         |  refresh: incremental
         |  versioned: true
         |  branch: ingest
         |sql: >
         |  SELECT doc_id, source, n_chars FROM documents WHERE n_chars >= 300
         |""".stripMargin
    run(s, yaml)
    run(s, yaml) // WAL replay with no new files: txn skip, nothing doubles
    require(graft.sinks.VersionedTable.versions(s, loc) == Seq(1L),
      "fw_stream_wap: the stream must stage on the branch, not main")
    require(graft.sinks.VersionedTable.read(s, loc).isEmpty,
      "fw_stream_wap: main readers must see the pre-stream snapshot")
    Engine.run(s, ConfigParser.parse(
      s"""job:
         |  name: fw-stream-wap-publish
         |  type: maintenance
         |maintenance:
         |  action: publish_branch
         |  location: $loc
         |  branch: ingest
         |""".stripMargin), "default")
    graft.sinks.VersionedTable.read(s, loc)
  }

  /** Column masking on the release path (`mask:`): hash-tokenize the
    * name (joins survive — the ext145 rule), star-prefix the segment,
    * null the balance; the masked frame is what dq_checks gate and what
    * the sink publishes, on batch and streaming paths alike. */
  private def fwMask(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "mask")
    rmrf(s, base)
    run(s,
      s"""job:
         |  name: fw-mask
         |  type: spark-sql
         |input_tables:
         |  - name: customer
         |    source: s3
         |    location: $d/customer.parquet
         |output_table:
         |  name: mask_out
         |  target: s3
         |  location: $base/out
         |  mask:
         |    c_name: hash
         |    c_mktsegment: last4
         |    c_acctbal: "null"
         |sql: >
         |  SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer
         |""".stripMargin)
    s.read.parquet(s"$base/out")
  }

  /** Masking on the STREAMING path: the same `mask:` block through the
    * available_now drain — every micro-batch publishes hash-tokenized
    * names; proves the sink-level mask is path-independent. */
  private def fwStreamMask(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "stream_mask")
    rmrf(s, base)
    s.read.parquet(s"$d/customer.parquet").write.parquet(s"$base/in")
    run(s,
      s"""job:
         |  name: fw-stream-mask
         |  type: spark-sql
         |  streaming: available_now
         |  checkpoint_location: $base/ckpt
         |input_tables:
         |  - name: customer
         |    source: s3
         |    location: $base/in
         |    format: parquet
         |    schema: "c_custkey BIGINT, c_name STRING, c_nationkey BIGINT, c_acctbal DOUBLE, c_mktsegment STRING"
         |output_table:
         |  name: stream_mask_out
         |  target: s3
         |  location: $base/out
         |  refresh: incremental
         |  mask:
         |    c_name: hash
         |sql: >
         |  SELECT c_custkey, c_name, c_mktsegment FROM customer
         |""".stripMargin)
    s.read.parquet(s"$base/out")
  }

  /** Row-level CDC over NON-APPEND commits: v1 (even half) → an UPDATE
    * commit (DV) zeroing one segment's balances → [[graft.sinks.VersionedTable.diffVersions]]
    * between v1 and v2 — the two-snapshot bag diff changesBetween's
    * abort message points at. Inserts are the updated images, deletes
    * their pre-images; untouched rows appear in neither. */
  private def fwVersionDiff(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "version_diff")
    rmrf(s, base)
    val loc = s"$base/out"
    val proj = s.read.parquet(s"$d/customer.parquet")
      .filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"),
        expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("cents"),
        col("c_mktsegment"))
    graft.sinks.VersionedTable.commit(s, loc, proj, "overwrite")
    graft.sinks.VersionedTable.updateWhere(s, loc,
      "c_mktsegment = 'FURNITURE'", Map("cents" -> "CAST(0 AS BIGINT)"))
    graft.sinks.VersionedTable.diffVersions(s, loc, 1L, 2L)
  }

  /** DV lifecycle end-to-end on the YAML surface: build a two-file
    * versioned table, delete heavily in one file, then
    * `maintenance.action: compact_deletes` rewrites ONLY that file
    * (targeted materialization; the other file carries with its DV).
    * The read-back is the unchanged logical content — the oracle knows
    * nothing of files or vectors. */
  private def fwDvCompact(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "dv_compact")
    rmrf(s, base)
    val loc = s"$base/out"
    val proj = s.read.parquet(s"$d/customer.parquet")
      .select(col("c_custkey"),
        expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("cents"),
        col("c_mktsegment"))
    graft.sinks.VersionedTable.commit(s, loc,
      proj.filter(col("c_custkey") % 2 === 0).coalesce(1), "overwrite",
      statsColumns = Seq("c_custkey"))
    graft.sinks.VersionedTable.commit(s, loc,
      proj.filter(col("c_custkey") % 2 === 1).coalesce(1), "append",
      statsColumns = Seq("c_custkey"))
    // heavy deletes in the EVEN file (4 of 5 segments), light in the odd
    graft.sinks.VersionedTable.deleteWhere(s, loc,
      "c_custkey % 2 = 0 AND c_mktsegment <> 'BUILDING'")
    graft.sinks.VersionedTable.deleteWhere(s, loc,
      "c_custkey % 2 = 1 AND c_mktsegment = 'MACHINERY'")
    Engine.run(s, ConfigParser.parse(
      s"""job:
         |  name: fw-dv-compact
         |  type: maintenance
         |maintenance:
         |  action: compact_deletes
         |  location: $loc
         |  min_deleted_fraction: "0.5"
         |""".stripMargin), "default")
    graft.sinks.VersionedTable.read(s, loc)
  }

  /** TPC-H REFRESH FUNCTIONS on the table format: the spec's RF1
    * (insert a batch of new lineitems) and RF2 (delete by order key)
    * run as an APPEND commit and a DELETION-VECTOR delete against a
    * versioned lineitem — the ACID maintenance workload TPC-H defines,
    * executed the way a table format should (RF1 moves only the new
    * files, RF2 moves only metadata), then the Q1 pricing summary over
    * the refreshed table. The oracle recomputes Q1 over the logical
    * (base ∪ inserts) − deletes in DuckDB. */
  private def fwTpchRefresh(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "tpch_rf")
    rmrf(s, base)
    val loc = s"$base/lineitem"
    val li = s.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
    graft.sinks.VersionedTable.commit(s, loc, li, "overwrite")
    // RF1: a deterministic insert batch (the completion-layer discipline:
    // derived from the fixture, identically replayed by the oracle)
    graft.sinks.VersionedTable.commit(s, loc,
      li.filter(col("l_orderkey") % 97 === 0)
        .withColumn("l_orderkey", col("l_orderkey") + 20000000L), "append")
    // RF2: delete by order key — metadata only, zero files rewritten
    graft.sinks.VersionedTable.deleteWhere(s, loc, "l_orderkey % 89 = 0")
    graft.sinks.VersionedTable.read(s, loc)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
  }

  /** Time travel through the ENGINE's input path: the [[fwAcid]]
    * lifecycle again, then a fourth run reads the table at
    * `as_of_version: 2` (before the upsert) as a `versioned: true`
    * input and republishes it plain — the snapshot must show v1+v2
    * content with none of v3's updates. */
  private def fwTimetravel(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "timetravel")
    rmrf(s, base)
    runAcidLifecycle(s, d, base)
    run(s,
      s"""job:
         |  name: fw-timetravel
         |  type: spark-sql
         |input_tables:
         |  - name: snap
         |    source: s3
         |    location: $base/out
         |    versioned: "true"
         |    as_of_version: "2"
         |output_table:
         |  name: tt_out
         |  target: s3
         |  location: $base/tt
         |sql: >
         |  SELECT c_custkey, cents, version FROM snap
         |""".stripMargin)
    s.read.parquet(s"$base/tt")
  }

  /** History reclamation through the YAML maintenance surface: the
    * [[fwAcid]] 3-version lifecycle, then `action: version_vacuum`
    * with `keep_from: "3"` — versions 1-2 and every data file only they
    * referenced are reclaimed, the surviving snapshot reads back
    * byte-identical, and pinned history really is gone (required). */
  private def fwVersionVacuum(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "version_vacuum")
    rmrf(s, base)
    runAcidLifecycle(s, d, base)
    Engine.run(s, ConfigParser.parse(
      s"""job:
         |  name: fw-version-vacuum
         |  type: maintenance
         |maintenance:
         |  action: version_vacuum
         |  location: $base/out
         |  keep_from: "3"
         |""".stripMargin), "default")
    val vs = graft.sinks.VersionedTable.versions(s, s"$base/out")
    require(vs == Seq(3L),
      s"fw_version_vacuum: expected only v3 to survive, got $vs")
    graft.sinks.VersionedTable.read(s, s"$base/out")
  }

  /** Zone maps end-to-end: the engine publishes customer as a versioned
    * table with `range_partition_keys` (disjoint c_custkey range per
    * file) and `stats_columns` (per-file min/max in the commit
    * manifest), then [[graft.sinks.VersionedTable.readPruned]] plans a
    * range scan `c_custkey <= 20` from the manifest alone. The require
    * asserts files were actually SKIPPED — at both SFs the predicate
    * touches 1-2 of 8 range files, so the gate fails loudly if pruning
    * ever degrades to scan-everything. The 100 TB read path: one small
    * JSONL decides which of a million files to open. */
  private def fwZonemap(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "zonemap")
    rmrf(s, base)
    run(s,
      s"""job:
         |  name: fw-zonemap
         |  type: spark-sql
         |input_tables:
         |  - name: customer
         |    source: s3
         |    location: $d/customer.parquet
         |output_table:
         |  name: zm_out
         |  target: s3
         |  location: $base/out
         |  refresh: full
         |  versioned: "true"
         |  repartition: "8"
         |  range_partition_keys: c_custkey
         |  stats_columns: c_custkey
         |sql: >
         |  SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
         |  c_mktsegment FROM customer
         |""".stripMargin)
    val scan = graft.sinks.VersionedTable.readPruned(s, s"$base/out",
      Seq(graft.sinks.VersionedTable.Prune("c_custkey", "<=", 20L)))
    require(scan.keptFiles < scan.totalFiles,
      s"fw_zonemap: expected manifest pruning to skip files, kept " +
        s"${scan.keptFiles} of ${scan.totalFiles}")
    // the pruned scan is a superset by contract; the residual filter
    // runs on the kept files only
    scan.df.filter(org.apache.spark.sql.functions.col("c_custkey") <= 20)
  }

  /** CDC over the versioned log: v1 full, v2/v3 incremental appends
    * through the engine, then `changesBetween(1, 3)` returns EXACTLY
    * the rows the two appends added, tagged `_commit_version` — from
    * file-level metadata (new files per manifest), no table diff. The
    * incremental-consumer read at 100 TB: process what arrived since
    * the bookmark version, never rescan. */
  private def fwChanges(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "changes")
    rmrf(s, base)
    def yaml(refresh: String, sql: String) =
      s"""job:
         |  name: fw-changes
         |  type: spark-sql
         |input_tables:
         |  - name: customer
         |    source: s3
         |    location: $d/customer.parquet
         |output_table:
         |  name: ch_out
         |  target: s3
         |  location: $base/out
         |  refresh: $refresh
         |  versioned: "true"
         |sql: >
         |  $sql
         |""".stripMargin
    def slice(r: Int) =
      s"""SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
         |  FROM customer WHERE c_custkey % 3 = $r""".stripMargin.replace("\n", " ")
    run(s, yaml("full", slice(0)))
    run(s, yaml("incremental", slice(1)))
    run(s, yaml("incremental", slice(2)))
    graft.sinks.VersionedTable.changesBetween(s, s"$base/out", 1L, 3L)
  }

  /** Zone-map pruning through the YAML INPUT surface: publish customer
    * versioned with range-disjoint files + stats, then a second engine
    * run reads it with `prune:` (parsed comparisons, planned from the
    * manifest, re-applied exactly) and republishes plain. The config
    * user's form of [[fwZonemap]]'s API call. */
  private def fwPruneInput(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "prune_input")
    rmrf(s, base)
    run(s,
      s"""job:
         |  name: fw-prune-publish
         |  type: spark-sql
         |input_tables:
         |  - name: customer
         |    source: s3
         |    location: $d/customer.parquet
         |output_table:
         |  name: pi_out
         |  target: s3
         |  location: $base/out
         |  refresh: full
         |  versioned: "true"
         |  repartition: "8"
         |  range_partition_keys: c_custkey
         |  stats_columns: c_custkey,c_mktsegment
         |sql: >
         |  SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
         |  c_mktsegment FROM customer
         |""".stripMargin)
    run(s,
      s"""job:
         |  name: fw-prune-read
         |  type: spark-sql
         |input_tables:
         |  - name: snap
         |    source: s3
         |    location: $base/out
         |    versioned: "true"
         |    prune: "c_custkey <= 40 AND c_mktsegment = 'BUILDING'"
         |output_table:
         |  name: pi_final
         |  target: s3
         |  location: $base/final
         |sql: >
         |  SELECT c_custkey, cents, c_mktsegment FROM snap
         |""".stripMargin)
    s.read.parquet(s"$base/final")
  }

  /** FILE-LEVEL MERGE through the YAML surface: a versioned publish with
    * range-disjoint files + zone maps on the merge key, then an upsert
    * touching only keys <= 20 — the merge must rewrite the one file
    * whose range can match and carry the other seven BY REFERENCE
    * (asserted via the carried-forward sidecar stats names, which track
    * file identity). The A16-at-scale contract: a narrow daily upsert
    * rewrites ~1/8 of this table, and would rewrite ~0.1% of a 100 TB
    * one. */
  private def fwMergePruned(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "merge_pruned")
    rmrf(s, base)
    def yaml(refresh: String, extra: String, sql: String) =
      s"""job:
         |  name: fw-merge-pruned
         |  type: spark-sql
         |input_tables:
         |  - name: customer
         |    source: s3
         |    location: $d/customer.parquet
         |output_table:
         |  name: mp_out
         |  target: s3
         |  location: $base/out
         |  refresh: $refresh
         |  versioned: "true"
         |  repartition: "8"
         |  range_partition_keys: c_custkey
         |  stats_columns: c_custkey
         |$extra
         |sql: >
         |  $sql
         |""".stripMargin
    run(s, yaml("full", "",
      """SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
        |  'v1' AS version FROM customer""".stripMargin.replace("\n", " ")))
    run(s, yaml("upsert", "  merge_keys: c_custkey",
      """SELECT c_custkey, CAST(0 AS BIGINT) AS cents, 'v2' AS version
        |  FROM customer WHERE c_custkey <= 20""".stripMargin.replace("\n", " ")))
    val v1Files = graft.sinks.VersionedTable.fileStats(s, s"$base/out", 1L).keySet
    val v2Files = graft.sinks.VersionedTable.fileStats(s, s"$base/out", 2L).keySet
    val carried = (v1Files intersect v2Files).size
    require(carried >= v1Files.size - 2,
      s"fw_merge_pruned: expected the narrow upsert to carry most files by " +
        s"reference, carried $carried of ${v1Files.size}")
    graft.sinks.VersionedTable.read(s, s"$base/out")
  }

  /** MERGE INTO on the SQL surface (r10 verdict #5): the same pruned
    * file-level merge as `fw_merge_pruned`, but driven by ONE SQL
    * statement through the engine's DML router ([[Engine.runSparkSqlJob]]
    * → [[graft.engine.SqlDml]]) instead of a YAML upsert sink. The
    * require pins the SAME scale contract: a narrow arrival set carries
    * almost every file by reference (zone-map pruning), so a 100 TB
    * table's 0.1% upsert rewrites ~0.1% of the files. Oracle identical
    * to fw_merge_pruned — the surface changes, the semantics must not. */
  private def fwMergeSql(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "merge_sql")
    rmrf(s, base)
    val loc = s"$base/out"
    // v1: the full table, range-partitioned with zone maps on the key
    run(s,
      s"""job:
         |  name: fw-merge-sql-v1
         |  type: spark-sql
         |input_tables:
         |  - name: customer
         |    source: s3
         |    location: $d/customer.parquet
         |output_table:
         |  name: ms_out
         |  target: s3
         |  location: $loc
         |  refresh: full
         |  versioned: "true"
         |  repartition: "8"
         |  range_partition_keys: c_custkey
         |  stats_columns: c_custkey
         |sql: >
         |  SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
         |  'v1' AS version FROM customer
         |""".stripMargin)
    // v2: MERGE INTO as one SQL statement — no output_table, the target
    // is the versioned input itself
    run(s,
      s"""job:
         |  name: fw-merge-sql-v2
         |  type: spark-sql
         |input_tables:
         |  - name: tgt
         |    source: s3
         |    location: $loc
         |    versioned: "true"
         |  - name: customer
         |    source: s3
         |    location: $d/customer.parquet
         |sql: >
         |  MERGE INTO tgt USING (SELECT c_custkey, CAST(0 AS BIGINT) AS cents,
         |  'v2' AS version FROM customer WHERE c_custkey <= 20) s
         |  ON tgt.c_custkey = s.c_custkey
         |  WHEN MATCHED THEN UPDATE SET *
         |  WHEN NOT MATCHED THEN INSERT *
         |""".stripMargin)
    val v1Files = graft.sinks.VersionedTable.fileStats(s, loc, 1L).keySet
    val v2Files = graft.sinks.VersionedTable.fileStats(s, loc, 2L).keySet
    val carried = (v1Files intersect v2Files).size
    require(carried >= v1Files.size - 2,
      s"fw_merge_sql: expected the SQL merge to carry most files by " +
        s"reference, carried $carried of ${v1Files.size}")
    graft.sinks.VersionedTable.read(s, loc)
  }

  /** Conditional-action SQL MERGE (r12 verdict #3): the full ANSI
    * action surface driven through two one-statement YAML jobs against
    * a versioned table. Merge 1 exercises first-action-wins ordering
    * (`WHEN MATCHED AND seg = BUILDING THEN DELETE` claims its rows
    * before the conditional column-SET update), a conditional
    * `INSERT *`, and the FILE-CARRY contract (arrival keys <= 60 touch
    * a bounded file subset of the range-partitioned table — REQUIREd).
    * Merge 2 exercises `WHEN NOT MATCHED BY SOURCE` — whose semantics
    * reach every unmatched target row, but which routes through the
    * DELETION VECTOR (r13 verdict #1): claimed rows' positions go to
    * the DV, their updated re-images append, and every prior file
    * carries by reference (REQUIREd: zero files lost + re-images
    * appended — a 100 TB retention merge writes ∝ claimed rows, not
    * ∝ the table). The oracle replays both merges closed-form. */
  private def fwMergeConditional(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "merge_cond")
    rmrf(s, base)
    val loc = s"$base/out"
    run(s,
      s"""job:
         |  name: fw-merge-cond-v1
         |  type: spark-sql
         |input_tables:
         |  - name: customer
         |    source: s3
         |    location: $d/customer.parquet
         |output_table:
         |  name: mc_out
         |  target: s3
         |  location: $loc
         |  refresh: full
         |  versioned: "true"
         |  repartition: "8"
         |  range_partition_keys: c_custkey
         |  stats_columns: c_custkey
         |sql: >
         |  SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
         |  c_mktsegment AS seg, 'v1' AS version FROM customer WHERE c_custkey % 2 = 0
         |""".stripMargin)
    def dml(sql: String) = run(s,
      s"""job:
         |  name: fw-merge-cond-dml
         |  type: spark-sql
         |input_tables:
         |  - name: tgt
         |    source: s3
         |    location: $loc
         |    versioned: "true"
         |  - name: customer
         |    source: s3
         |    location: $d/customer.parquet
         |sql: >
         |  $sql
         |""".stripMargin)
    dml("""MERGE INTO tgt USING (SELECT c_custkey,
          |  CAST(floor(c_acctbal * 50 + 0.5) AS BIGINT) AS cents,
          |  c_mktsegment AS seg, 'v2' AS version
          |  FROM customer WHERE c_custkey <= 60) s
          |  ON tgt.c_custkey = s.c_custkey
          |  WHEN MATCHED AND s.seg = 'BUILDING' THEN DELETE
          |  WHEN MATCHED AND s.cents > tgt.cents THEN UPDATE SET cents = s.cents, version = 'upd'
          |  WHEN NOT MATCHED AND s.cents >= 0 THEN INSERT *""".stripMargin.replace("\n", " "))
    val v1Files = graft.sinks.VersionedTable.fileStats(s, loc, 1L).keySet
    val v2Files = graft.sinks.VersionedTable.fileStats(s, loc, 2L).keySet
    val carried = (v1Files intersect v2Files).size
    require(carried >= v1Files.size - 2,
      s"fw_merge_conditional: the conditional merge must keep the file-carry " +
        s"contract (arrival keys <= 60), carried $carried of ${v1Files.size}")
    dml("""MERGE INTO tgt USING (SELECT c_custkey FROM customer WHERE c_custkey <= 60) s
          |  ON tgt.c_custkey = s.c_custkey
          |  WHEN NOT MATCHED BY SOURCE AND tgt.cents < 0 THEN UPDATE SET version = 'stale'""".stripMargin.replace("\n", " "))
    val v3Files = graft.sinks.VersionedTable.fileStats(s, loc, 3L).keySet
    require(v2Files.subsetOf(v3Files),
      s"fw_merge_conditional: the DV-routed BY SOURCE merge must carry every " +
        s"prior file by reference, lost ${(v2Files -- v3Files).size} " +
        s"of ${v2Files.size}")
    require((v3Files -- v2Files).nonEmpty,
      "fw_merge_conditional: the BY SOURCE UPDATE must append re-image files " +
        "(claimed rows' old positions to the DV, new images as fresh files)")
    graft.sinks.VersionedTable.read(s, loc)
  }

  /** DELETE FROM + UPDATE on the SQL surface: two one-statement jobs
    * against a versioned table — a deletion-vector delete (zero files
    * rewritten) then a DV update (old positions to the DV, new images
    * appended), with qualified (`t.col`) references exercising the
    * qualifier stripping. */
  private def fwDmlSql(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "dml_sql")
    rmrf(s, base)
    val loc = s"$base/out"
    val src = s.read.parquet(s"$d/customer.parquet")
      .select(col("c_custkey"),
        expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("cents"),
        col("c_mktsegment"))
    graft.sinks.VersionedTable.commit(s, loc, src, "overwrite")
    def dml(sql: String) = run(s,
      s"""job:
         |  name: fw-dml-sql
         |  type: spark-sql
         |input_tables:
         |  - name: t
         |    source: s3
         |    location: $loc
         |    versioned: "true"
         |sql: >
         |  $sql
         |""".stripMargin)
    dml("DELETE FROM t WHERE t.cents < 0")
    dml("UPDATE t SET cents = t.cents + 100 WHERE t.c_mktsegment = 'BUILDING'")
    require(graft.sinks.VersionedTable.versions(s, loc) == Seq(1L, 2L, 3L),
      "fw_dml_sql: delete and update must land one version each")
    graft.sinks.VersionedTable.read(s, loc)
  }

  /** RESTORE on the YAML surface — the bad-deploy recovery drill: v1
    * (the good snapshot) → v2 (a corrupting overwrite) →
    * `maintenance.action: restore, to_version: 1` → v3 references
    * exactly v1's files (metadata-only, zero bytes moved) while v2
    * STAYS time-travelable for the post-mortem. The requires pin all
    * three: the rollback content, the preserved history, and the
    * unchanged version count (+1 commit, no deletions). */
  private def fwRestore(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "restore")
    rmrf(s, base)
    val loc = s"$base/out"
    def commitYaml(where: String, tag: String) = run(s,
      s"""job:
         |  name: fw-restore-$tag
         |  type: spark-sql
         |input_tables:
         |  - name: customer
         |    source: s3
         |    location: $d/customer.parquet
         |output_table:
         |  name: restore_out
         |  target: s3
         |  location: $loc
         |  refresh: full
         |  versioned: "true"
         |sql: >
         |  SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
         |  '$tag' AS version FROM customer WHERE $where
         |""".stripMargin)
    commitYaml("c_custkey % 2 = 0", "good")
    commitYaml("c_custkey % 100 = 0", "bad") // the corrupting deploy
    Engine.run(s, ConfigParser.parse(
      s"""job: {name: fw-restore-roll, type: maintenance}
         |maintenance: {action: restore, location: $loc, to_version: "1"}
         |""".stripMargin), "default")
    require(graft.sinks.VersionedTable.versions(s, loc) == Seq(1L, 2L, 3L),
      "fw_restore: restore must land one new version, deleting none")
    require(graft.sinks.VersionedTable.read(s, loc, asOf = Some(2L))
      .filter(col("version") === "bad").count() > 0,
      "fw_restore: the bad version must stay time-travelable")
    graft.sinks.VersionedTable.read(s, loc)
  }

  /** DESCRIBE HISTORY from metadata alone: three engine commits with
    * `stats_columns` (which records per-file row counts in the sidecar),
    * then [[graft.sinks.VersionedTable.history]] — version, mode, file
    * count, row count per commit WITHOUT opening a data file. `
    * repartition: "2"` pins n_files so the oracle is exact. */
  private def fwHistory(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "history")
    rmrf(s, base)
    def yaml(refresh: String, r: Int) =
      s"""job:
         |  name: fw-history
         |  type: spark-sql
         |input_tables:
         |  - name: customer
         |    source: s3
         |    location: $d/customer.parquet
         |output_table:
         |  name: h_out
         |  target: s3
         |  location: $base/out
         |  refresh: $refresh
         |  versioned: "true"
         |  repartition: "2"
         |  stats_columns: c_custkey
         |sql: >
         |  SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
         |  FROM customer WHERE c_custkey % 3 = $r
         |""".stripMargin
    run(s, yaml("full", 0))
    run(s, yaml("incremental", 1))
    run(s, yaml("incremental", 2))
    graft.sinks.VersionedTable.history(s, s"$base/out")
      .select("version", "mode", "n_files", "n_rows")
  }

  /** Time travel by WALL CLOCK through the engine's input path: the
    * [[fwAcid]] lifecycle, then a read pinned to v2's recorded commit
    * timestamp via `as_of_timestamp` — the snapshot must show v1+v2
    * content with none of v3's updates (same oracle as
    * [[fwTimetravel]]'s version-pinned read). */
  private def fwTimetravelTs(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "timetravel_ts")
    rmrf(s, base)
    runAcidLifecycle(s, d, base)
    val ts = graft.sinks.VersionedTable.history(s, s"$base/out").collect()
      .map(r => (r.getAs[Long]("version"), r.getAs[Long]("ts_millis"))).toMap
    require(ts(2L) < ts(3L), // engine runs are seconds apart; pin it anyway
      s"fw_timetravel_ts: v2/v3 committed in the same millisecond ($ts)")
    run(s,
      s"""job:
         |  name: fw-timetravel-ts
         |  type: spark-sql
         |input_tables:
         |  - name: snap
         |    source: s3
         |    location: $base/out
         |    versioned: "true"
         |    as_of_timestamp: "${ts(2L)}"
         |output_table:
         |  name: tt_out
         |  target: s3
         |  location: $base/tt
         |sql: >
         |  SELECT c_custkey, cents, version FROM snap
         |""".stripMargin)
    s.read.parquet(s"$base/tt")
  }

  /** A2 + A14: catalog (metastore) source AND sink. A parquet fixture is
    * published to the session catalog, the engine reads it as a `gdc`
    * source and writes a `gdc` target; we read the result back via
    * spark.table — the reference's from_catalog/UPDATE_IN_DATABASE path
    * (`glue_etl_framework.py:105-116,233-258`) minus AWS. */
  private def fwCatalog(s: SparkSession, d: String): DataFrame = {
    // the in-memory catalog is per-JVM but the warehouse dirs persist —
    // clear both so overwrite doesn't hit LOCATION_ALREADY_EXISTS
    Seq("fw_cat_supplier", "fw_cat_out").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS default.$t")
      rmrf(s, s"${s.conf.get("spark.sql.warehouse.dir")}/$t")
    }
    s.read.parquet(s"$d/supplier.parquet")
      .write.mode("overwrite").saveAsTable("fw_cat_supplier")
    val yaml =
      s"""job:
         |  name: fw-catalog
         |  type: spark-sql
         |input_tables:
         |  - name: supplier
         |    source: gdc
         |    database: default
         |    table: fw_cat_supplier
         |output_table:
         |  name: fw_cat_out
         |  target: gdc
         |  database: default
         |sql: >
         |  SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
         |         CAST(sum(floor(s_acctbal * 100 + 0.5)) AS BIGINT) AS acctbal_cents
         |  FROM supplier GROUP BY s_nationkey
         |""".stripMargin
    run(s, yaml)
    s.table("default.fw_cat_out")
  }

  /** A2/A14 + ANALYZE: catalog statistics for the cost-based optimizer.
    * The engine publishes a fixture to the catalog, `ANALYZE TABLE ...
    * COMPUTE STATISTICS FOR COLUMNS` records rowCount + per-column
    * min/max/nullCount, and the query reports those CATALOG-recorded
    * values — the oracle recomputes every one from the raw parquet, so
    * a drifting stats pipeline (sampling, stale cache, lost ANALYZE)
    * fails the value compare. At 100 TB this is the mechanism that
    * lets the CBO pick broadcast sides and join orders at PLAN time
    * (AQE only re-plans after a shuffle materializes);
    * `PlanAuditSpec` asserts the optimizer actually consumes these
    * numbers (rowCount visible in plan stats under CBO). Only
    * deterministic stats are emitted — row_count/min/max/nullCount are
    * exact by contract; distinct counts are HLL-approximate and stay
    * out of the oracle. */
  private def fwAnalyze(s: SparkSession, d: String): DataFrame = {
    s.sql("DROP TABLE IF EXISTS default.fw_an_customer")
    rmrf(s, s"${s.conf.get("spark.sql.warehouse.dir")}/fw_an_customer")
    val yaml =
      s"""job:
         |  name: fw-analyze
         |  type: spark-sql
         |input_tables:
         |  - name: customer
         |    source: s3
         |    location: $d/customer.parquet
         |output_table:
         |  name: fw_an_customer
         |  target: gdc
         |  database: default
         |sql: >
         |  SELECT * FROM customer
         |""".stripMargin
    run(s, yaml)
    s.sql("ANALYZE TABLE default.fw_an_customer COMPUTE STATISTICS FOR COLUMNS c_custkey")
    val meta = s.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("fw_an_customer", Some("default")))
    val st = meta.stats.getOrElse(sys.error("ANALYZE recorded no table stats"))
    val cs = st.colStats.getOrElse("c_custkey",
      sys.error("ANALYZE recorded no column stats for c_custkey"))
    import s.implicits._
    Seq(
      ("row_count", st.rowCount.map(_.toLong)
        .getOrElse(sys.error("no rowCount"))),
      ("min_custkey", cs.min.map(_.toString.toLong)
        .getOrElse(sys.error("no min"))),
      ("max_custkey", cs.max.map(_.toString.toLong)
        .getOrElse(sys.error("no max"))),
      ("null_custkey", cs.nullCount.map(_.toLong)
        .getOrElse(sys.error("no nullCount")))
    ).toDF("stat", "value")
  }

  /** Bucketed catalog sink: the engine's `bucket_by`/`buckets` config
    * keys persist the output hash-bucketed and sorted on the key — the
    * shuffle-once storage layout (see [[graft.sources.Bucketed]]); the
    * YAML surface means a config author gets it without code. SinksSpec
    * asserts the written table carries the bucket spec. */
  private def fwBucket(s: SparkSession, d: String): DataFrame = {
    s.sql("DROP TABLE IF EXISTS default.fw_bkt_out")
    rmrf(s, s"${s.conf.get("spark.sql.warehouse.dir")}/fw_bkt_out")
    val yaml =
      s"""job:
         |  name: fw-bucket
         |  type: spark-sql
         |input_tables:
         |  - name: orders
         |    source: s3
         |    location: $d/orders.parquet
         |output_table:
         |  name: fw_bkt_out
         |  target: gdc
         |  database: default
         |  bucket_by: o_custkey
         |  buckets: 8
         |sql: >
         |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
         |         CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS total_cents
         |  FROM orders GROUP BY o_custkey
         |""".stripMargin
    run(s, yaml)
    s.table("default.fw_bkt_out")
  }

  /** A3 + JDBC sink: REAL JDBC on both ends (the reference's jdbc source
    * is a crashing stub, `glue_etl_framework.py:119-120,128`, and it has
    * no jdbc write branch at all). Round-trips nation through an embedded
    * Derby database: jdbc write → engine jdbc SOURCE → engine jdbc SINK →
    * jdbc read-back. */
  private def fwJdbc(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "jdbc")
    rmrf(s, base)
    // keep derby.log out of the process cwd (the repo)
    System.setProperty("derby.system.home", "/tmp/graft-fw")
    val url = s"jdbc:derby:$base/db;create=true"
    s.read.parquet(s"$d/nation.parquet")
      .write.mode("overwrite").format("jdbc")
      .option("url", url).option("dbtable", "nation").save()
    val yaml =
      s"""job:
         |  name: fw-jdbc
         |  type: spark-sql
         |input_tables:
         |  - name: nation
         |    source: jdbc
         |    url: "$url"
         |    table: nation
         |output_table:
         |  name: jdbc_out
         |  target: jdbc
         |  url: "$url"
         |  table: jdbc_out
         |sql: >
         |  SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations
         |  FROM nation GROUP BY n_regionkey
         |""".stripMargin
    run(s, yaml)
    s.read.format("jdbc").option("url", url).option("dbtable", "jdbc_out").load()
      .select(col("n_regionkey").cast("int").as("n_regionkey"),
        col("n_nations").cast("long").as("n_nations"))
  }

  /** A17: script-job dispatch through Engine.run — reflection-loaded
    * [[graft.script.ExampleScriptJob]] with vars, output read back. */
  private def fwScript(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "script")
    rmrf(s, base)
    val yaml =
      s"""job:
         |  name: fw-script
         |  type: python-script
         |variables:
         |  default:
         |    in: $d/nation.parquet
         |    out: $base/out
         |script_class: graft.script.ExampleScriptJob
         |""".stripMargin
    Engine.run(s, ConfigParser.parse(yaml), "default")
    s.read.parquet(s"$base/out")
  }

  /** A17, the runtime-load half: `script_jar` points at a jar compiled
    * OUTSIDE the engine build (fixtures/scriptjar — source + build.sh
    * checked in); the job class resolves only through the jar's
    * URLClassLoader, proving a user ships custom job code without
    * rebuilding the engine — the reference's exec()-a-downloaded-script
    * capability (`glue_etl_framework.py:279-309`). */
  private def fwScriptJar(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "scriptjar")
    rmrf(s, base)
    val jar = Seq("fixtures/scriptjar/external-script-job.jar",
        "/root/repo/fixtures/scriptjar/external-script-job.jar")
      .map(new java.io.File(_)).find(_.isFile)
      .getOrElse(sys.error("external-script-job.jar fixture missing — run fixtures/scriptjar/build.sh"))
    // guard the fixture's premise: the class must NOT be on our classpath
    val onClasspath =
      try { Class.forName("example.jobs.ExternalScoreJob"); true }
      catch { case _: ClassNotFoundException => false }
    require(!onClasspath, "fixture class leaked onto the engine classpath")
    val yaml =
      s"""job:
         |  name: fw-script-jar
         |  type: script
         |variables:
         |  default:
         |    in: $d/nation.parquet
         |    out: $base/out
         |script_class: example.jobs.ExternalScoreJob
         |script_jar: ${jar.getAbsolutePath}
         |""".stripMargin
    Engine.run(s, ConfigParser.parse(yaml), "default")
    s.read.parquet(s"$base/out")
  }

  /** Declared deviation (SURVEY §1): optional `schema:` DDL on a file
    * input. A headerless pipe-separated csv gets real names and types
    * from the config — no header row, no inference pre-scan (which at
    * 100 TB is a full extra read of the input). The SQL then uses the
    * DDL-given names, proving the schema actually bound. */
  private def fwSchema(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "schema")
    rmrf(s, base)
    // stage nation as a HEADERLESS csv (fixed column order via select)
    s.read.parquet(s"$d/nation.parquet")
      .select("n_nationkey", "n_name", "n_regionkey")
      .write.option("header", "false").option("sep", "|").csv(s"$base/src")
    val yaml =
      s"""job:
         |  name: fw-schema
         |  type: spark-sql
         |input_tables:
         |  - name: nations_raw
         |    source: s3
         |    location: $base/src
         |    format: csv
         |    schema: "nkey INT, nname STRING, rkey INT"
         |    format_options:
         |      separator: "|"
         |output_table:
         |  name: schema_out
         |  target: s3
         |  location: $base/out
         |sql: >
         |  SELECT rkey, count(*) AS n_nations, min(nname) AS first_name
         |  FROM nations_raw GROUP BY rkey
         |""".stripMargin
    run(s, yaml)
    s.read.parquet(s"$base/out")
  }

  /** Streaming job type (`job.streaming: available_now`): the YAML-declared
    * pipeline drained as one bounded Structured Streaming run — readStream
    * file source with explicit schema, the declared SELECT executed
    * incrementally, partitioned incremental append through the batch sink
    * machinery. The job runs TWICE against the SAME checkpoint: the second
    * drain sees no new files and must emit NOTHING (exactly-once re-run
    * semantics — the streaming analog of A22 bookmarks); a re-emit would
    * double the read-back rows and break the oracle hash. */
  private def fwStream(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "stream")
    rmrf(s, base)
    // streaming file sources watch a DIRECTORY; stage the fixture into a
    // landing dir (what a streaming ingest consumes in production)
    s.read.parquet(s"$d/documents.parquet").write.parquet(s"$base/in")
    val yaml =
      s"""job:
         |  name: fw-stream
         |  type: spark-sql
         |  streaming: available_now
         |  checkpoint_location: $base/ckpt
         |input_tables:
         |  - name: documents
         |    source: s3
         |    location: $base/in
         |    format: parquet
         |    schema: "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
         |output_table:
         |  name: stream_out
         |  target: s3
         |  location: $base/out
         |  refresh: incremental
         |  partition_keys: source
         |sql: >
         |  SELECT doc_id, source, lang, n_chars FROM documents
         |  WHERE n_chars >= 300
         |""".stripMargin
    run(s, yaml)
    run(s, yaml) // same checkpoint, no new files → must append nothing
    s.read.parquet(s"$base/out").select("doc_id", "source", "lang", "n_chars")
  }

  /** STATE-METRICS SURFACE (r10 verdict #9): a watermarked windowed
    * aggregation drained twice through [[graft.streaming.Streams
    * .runToSink]] — drain 1 is the events fixture (closed windows
    * emit, trailing windows stay open in state), drain 2 stages a
    * 100-days-late copy whose every row must be DROPPED by the
    * checkpoint-restored watermark. The requires assert the published
    * `_graft_stream_metrics.json` / returned metrics against the
    * drain's KNOWN state shape: dropped_late rows registered (Spark
    * counts drops AT THE STATE STORE, i.e. after map-side partial
    * aggregation — so the gauge reads in (0, late-row-count], never 0
    * when late data arrived and never more than the raw late rows),
    * live state rows > 0, watermark > 0 — the stateful tier's
    * documented bounds, observable at runtime. The
    * read-back is the st09 append-emission result (the late drain
    * contributes nothing), value-oracled with the same watermark
    * arithmetic. */
  private def fwStreamMetrics(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "stream_metrics")
    rmrf(s, base)
    val ev = graft.streaming.Streams.normalizeTs(
      s.read.parquet(s"$d/events.parquet"))
    ev.write.parquet(s"$base/in")
    val out = graft.config.OutputTable(
      name = "stream_metrics_out",
      target = graft.config.TargetSpec.File(s"$base/out"),
      refresh = graft.config.Refresh.Incremental)
    def drain(): Map[String, Long] = {
      val stream = s.readStream.schema(ev.schema).parquet(s"$base/in")
      graft.streaming.Streams.runToSink(s,
        graft.streaming.Streams.windowedCountsAppend(stream, "1 hour"),
        out, s"$base/ckpt")
    }
    val m1 = drain()
    require(m1("state_rows_last") > 0,
      "fw_stream_metrics: open trailing windows must be visible as live state rows")
    require(m1("dropped_late_total") == 0,
      "fw_stream_metrics: the in-order drain must drop nothing")
    // drain 2: every row sits 100 days behind the checkpointed watermark
    val late = ev.filter(col("ts").isNotNull)
      .withColumn("ts", col("ts") - expr("INTERVAL 2400 HOURS"))
    val nLate = late.count()
    late.write.mode("append").parquet(s"$base/in")
    val m2 = drain()
    val droppedGauge = m2("dropped_late_total")
    require(droppedGauge > 0 && droppedGauge <= nLate,
      s"fw_stream_metrics: the late drain must register drops in (0, $nLate], " +
        s"metrics read $droppedGauge")
    require(m2("watermark_ms") > 0 && m2("state_rows_last") > 0,
      "fw_stream_metrics: watermark and state gauges must survive the restart")
    // the published surface itself: the JSON beside the table
    val mf = new org.apache.hadoop.fs.Path(s"$base/out/_graft_stream_metrics.json")
    val fs = mf.getFileSystem(s.sparkContext.hadoopConfiguration)
    val text = {
      val in = fs.open(mf)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    require(text.contains(s""""dropped_late_total":$droppedGauge"""),
      s"fw_stream_metrics: published metrics file must carry the drop count, got: $text")
    s.read.parquet(s"$base/out")
      .select("window_start", "window_end", "event_type", "n_events", "value_cents")
  }

  /** Streaming drain INTO a versioned table: every micro-batch lands as
    * an append COMMIT carrying (checkpoint, batchId) as its txn — a
    * WAL-replayed batch is skipped by the table (exactly-once at the
    * table level, not just the source level). Run twice against one
    * checkpoint like [[fwStream]]; the read-back is the committed
    * snapshot via [[graft.sinks.VersionedTable.read]]. */
  private def fwStreamAcid(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "stream_acid")
    rmrf(s, base)
    s.read.parquet(s"$d/documents.parquet").write.parquet(s"$base/in")
    val yaml =
      s"""job:
         |  name: fw-stream-acid
         |  type: spark-sql
         |  streaming: available_now
         |  checkpoint_location: $base/ckpt
         |input_tables:
         |  - name: documents
         |    source: s3
         |    location: $base/in
         |    format: parquet
         |    schema: "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
         |output_table:
         |  name: stream_acid_out
         |  target: s3
         |  location: $base/out
         |  refresh: incremental
         |  versioned: true
         |sql: >
         |  SELECT doc_id, source, lang, n_chars FROM documents
         |  WHERE n_chars >= 300
         |""".stripMargin
    run(s, yaml)
    run(s, yaml) // same checkpoint: no new files → no new commits
    graft.sinks.VersionedTable.read(s, s"$base/out")
      .select("doc_id", "source", "lang", "n_chars")
  }

  /** Zone maps ON THE STREAM: the [[fwStreamAcid]] drain with
    * `stats_columns` — every micro-batch append commit records its new
    * files' min/max/rows in the sidecar (stats cost ∝ the batch, never
    * the table), so a downstream range consumer prunes the versioned
    * table WITHOUT any batch-side compaction step. The require pins
    * that a doc_id range probe actually skips files at both SFs. */
  private def fwStreamZonemap(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "stream_zonemap")
    rmrf(s, base)
    s.read.parquet(s"$d/documents.parquet").write.parquet(s"$base/in")
    val yaml =
      s"""job:
         |  name: fw-stream-zonemap
         |  type: spark-sql
         |  streaming: available_now
         |  checkpoint_location: $base/ckpt
         |input_tables:
         |  - name: documents
         |    source: s3
         |    location: $base/in
         |    format: parquet
         |    schema: "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
         |output_table:
         |  name: stream_zm_out
         |  target: s3
         |  location: $base/out
         |  refresh: incremental
         |  versioned: true
         |  repartition: "8"
         |  range_partition_keys: doc_id
         |  stats_columns: doc_id
         |sql: >
         |  SELECT doc_id, source, lang, n_chars FROM documents
         |""".stripMargin
    run(s, yaml)
    val scan = graft.sinks.VersionedTable.readPruned(s, s"$base/out",
      Seq(graft.sinks.VersionedTable.Prune("doc_id", "<", 60L)))
    require(scan.keptFiles < scan.totalFiles,
      s"fw_stream_zonemap: expected pruning on the streamed commits, kept " +
        s"${scan.keptFiles} of ${scan.totalFiles}")
    scan.df.filter(org.apache.spark.sql.functions.col("doc_id") < 60)
      .select("doc_id", "source", "lang", "n_chars")
  }

  /** Native graft aggregates on the DECLARATIVE surface: the ext98
    * heavy-hitters two-pass written entirely in the engine's
    * single-SELECT SQL (sql_file), using the `misra_gries` function the
    * session extensions register — sketch CTE, candidate explode, exact
    * recount, the n/(k+1) HAVING — driven through the YAML lifecycle
    * and read back from the parquet sink. Proves a user of the config
    * surface (not the Scala API) can reach the sketch tier; the oracle
    * is ext98's verbatim. */
  private def fwSketch(s: SparkSession, d: String): DataFrame = {
    // the engine runs plain spark.sql — the session must have graft's
    // native functions even when the caller didn't configure extensions
    graft.sql.GraftExtensions.ensureRegistered(s)
    val base = scratch(d, "sketch")
    rmrf(s, base)
    val sqlPath = new org.apache.hadoop.fs.Path(s"$base/query.sql")
    val fs = sqlPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val out = fs.create(sqlPath, true)
    try out.write(
      ("WITH rw AS (\n" +
       "  SELECT CASE WHEN doc_id % 2 = 0\n" +
      s"              THEN '${Tables.BoilerSentence}'\n" +
       "              ELSE text END AS text\n" +
       "  FROM documents\n" +
       "), w AS (\n" +
       "  SELECT filter(split(trim(text), '\\\\s+'), x -> x <> '') AS w FROM rw\n" +
       "), bi AS (\n" +
       "  SELECT explode(CASE WHEN size(w) >= 2\n" +
       "    THEN transform(sequence(1, size(w) - 1), i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))\n" +
       "    ELSE CAST(array() AS ARRAY<STRING>) END) AS item\n" +
       "  FROM w\n" +
       "), sk AS (\n" +
       "  SELECT misra_gries(item, 96) AS cands, count(*) AS n_items FROM bi\n" +
       "), cand AS (\n" +
       "  SELECT explode(cands) AS item, n_items FROM sk\n" +
       ")\n" +
       "SELECT bi.item, count(*) AS cnt, cand.n_items\n" +
       "FROM bi JOIN cand ON bi.item = cand.item\n" +
       "GROUP BY bi.item, cand.n_items\n" +
       "HAVING count(*) * 97 > cand.n_items").getBytes("UTF-8"))
    finally out.close()
    val yaml =
      s"""job:
         |  name: fw-sketch
         |  type: spark-sql
         |input_tables:
         |  - name: documents
         |    source: s3
         |    location: $d/documents.parquet
         |output_table:
         |  name: sketch_out
         |  target: s3
         |  location: $base/out
         |sql_file: $base/query.sql
         |""".stripMargin
    run(s, yaml)
    s.read.parquet(s"$base/out").select("item", "cnt", "n_items")
  }

  /** A1 format matrix beyond parquet/csv: the same lifecycle through a
    * JSON input and an ORC input joined in one SQL, written to an ORC
    * sink and read back — pins the reader/writer option mapping for the
    * two formats nothing else exercises. */
  private def fwFormats(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "formats")
    rmrf(s, base)
    s.read.parquet(s"$d/nation.parquet").coalesce(1).write.json(s"$base/nation_json")
    s.read.parquet(s"$d/region.parquet").coalesce(1).write.orc(s"$base/region_orc")
    val yaml =
      s"""job:
         |  name: fw-formats
         |  type: spark-sql
         |input_tables:
         |  - name: nation
         |    source: s3
         |    location: $base/nation_json
         |    format: json
         |    schema: "n_nationkey INT, n_name STRING, n_regionkey INT"
         |  - name: region
         |    source: s3
         |    location: $base/region_orc
         |    format: orc
         |output_table:
         |  name: formats_out
         |  target: s3
         |  location: $base/out
         |  format: orc
         |sql: >
         |  SELECT r.r_name, CAST(count(*) AS BIGINT) AS n_nations,
         |         min(n.n_name) AS first_nation
         |  FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
         |  GROUP BY r.r_name
         |""".stripMargin
    run(s, yaml)
    s.read.orc(s"$base/out")
  }

  /** A1/A11 avro passthrough (reference `README.md:44,53`) through graft's
    * own container-format implementation ([[graft.sources.GraftAvroFileFormat]]
    * — the spark-avro module is absent from this classpath): stage nation
    * as avro INPUT, run the YAML pipeline, publish avro OUTPUT, read it
    * back. The oracle recomputes from the raw parquet, so a value drift
    * anywhere in the avro encode→decode→encode→decode chain fails the
    * hash. Timestamps exercise the timestamp-micros logical type. */
  private def fwAvro(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "avro")
    rmrf(s, base)
    s.read.parquet(s"$d/nation.parquet").coalesce(1)
      .write.format("avro").save(s"$base/nation_avro")
    run(s,
      s"""job:
         |  name: fw-avro
         |  type: spark-sql
         |input_tables:
         |  - name: nation
         |    source: s3
         |    location: $base/nation_avro
         |    format: avro
         |output_table:
         |  name: avro_out
         |  target: s3
         |  location: $base/out
         |  format: avro
         |sql: >
         |  SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations,
         |         min(n_name) AS first_nation,
         |         timestamp_micros(CAST(n_regionkey AS BIGINT) * 1000000 + 1700000000000000) AS marker_ts
         |  FROM nation GROUP BY n_regionkey
         |""".stripMargin)
    s.read.format("avro").load(s"$base/out")
  }

  /** A1/A11 XML passthrough through Spark 4's BUILT-IN xml source
    * (spark-xml was merged upstream — no new dependency): stage nation
    * as XML input with a `rowTag`, run the YAML pipeline (format_options
    * carries rowTag on both sides), publish an XML OUTPUT, read it back
    * with an explicit schema (XML read-back otherwise re-infers types).
    * The oracle recomputes from the raw parquet, so value drift anywhere
    * in the xml encode→decode→encode→decode chain fails the hash. */
  private def fwXml(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "xml")
    rmrf(s, base)
    s.read.parquet(s"$d/nation.parquet").coalesce(1)
      .write.format("xml").option("rowTag", "nation").save(s"$base/nation_xml")
    run(s,
      s"""job:
         |  name: fw-xml
         |  type: spark-sql
         |input_tables:
         |  - name: nation
         |    source: s3
         |    location: $base/nation_xml
         |    format: xml
         |    format_options:
         |      rowTag: nation
         |    schema: "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT"
         |output_table:
         |  name: xml_out
         |  target: s3
         |  location: $base/out
         |  format: xml
         |  format_options:
         |    rowTag: nation_agg
         |sql: >
         |  SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations,
         |         min(n_name) AS first_nation
         |  FROM nation GROUP BY n_regionkey
         |""".stripMargin)
    s.read.format("xml").option("rowTag", "nation_agg")
      .schema("n_regionkey BIGINT, n_nations BIGINT, first_nation STRING")
      .load(s"$base/out")
  }

  /** VARIANT through the SINK path (r7 verdict task 8): ext88 proved
    * VARIANT absorption at READ; this drives a VARIANT COLUMN through
    * the engine's parquet sink (Spark 4 parquet carries VariantType as
    * its variant logical type) and re-extracts typed paths from the
    * ROUND-TRIPPED column — storage fidelity, not just parse fidelity,
    * oracle-pinned against the original rows. The staged corpus drifts
    * across three JSON shapes (nested meta.lang / flat lang / body with
    * no lang), so the stored variant is genuinely heterogeneous: a
    * static struct schema could not express the written column. */
  private def fwVariant(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "variant")
    rmrf(s, base)
    Tables.stageDriftingJsonl(s, d, base)
    run(s,
      s"""job:
         |  name: fw-variant
         |  type: spark-sql
         |input_tables:
         |  - name: raw_crawl
         |    source: s3
         |    location: $base/corpus_jsonl
         |    format: text
         |    schema: "value STRING"
         |output_table:
         |  name: variant_out
         |  target: s3
         |  location: $base/out
         |  format: parquet
         |sql: >
         |  SELECT parse_json(value) AS payload FROM raw_crawl
         |""".stripMargin)
    s.read.parquet(s"$base/out").selectExpr(
      "variant_get(payload, '$.doc_id', 'bigint') AS doc_id",
      "coalesce(variant_get(payload, '$.meta.lang', 'string'), " +
        "variant_get(payload, '$.lang', 'string'), 'und') AS lang",
      "CAST(length(coalesce(variant_get(payload, '$.text', 'string'), " +
        "variant_get(payload, '$.body', 'string'))) AS BIGINT) AS n_chars")
  }

  /** A22: bookmark high-watermark store. Stage file 1 → plan/read/commit;
    * stage file 2 (mtime forced past the watermark) → the second plan must
    * include ONLY the new file. Returned frame = read1 ∪ read2; if the
    * second plan re-read file 1 the row count (and hash) would differ. */
  private def fwBookmark(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "bookmark")
    rmrf(s, base)
    val conf = s.sparkContext.hadoopConfiguration
    val srcDir = new org.apache.hadoop.fs.Path(s"$base/src")
    val fs = srcDir.getFileSystem(conf)
    fs.mkdirs(srcDir)
    def stage(name: String, mtime: Option[Long]): Long = {
      val dst = new org.apache.hadoop.fs.Path(srcDir, name)
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new org.apache.hadoop.fs.Path(s"$d/nation.parquet"), fs, dst, false, conf)
      mtime.foreach(t => fs.setTimes(dst, t, -1))
      fs.getFileStatus(dst).getModificationTime
    }
    val store = new graft.bookmarks.BookmarkStore(s, s"$base/bookmark.json")
    val t1 = stage("part1.parquet", None)
    val plan1 = store.plan("fw:nation", s"$base/src")
    val read1 = store.read(plan1, "parquet")
    val n1 = read1.count()
    store.commit(plan1)
    // force the new file's mtime strictly past the committed watermark —
    // sub-ms staging on a coarse-mtime filesystem must not hide it
    stage("part2.parquet", Some(t1 + 2000))
    val plan2 = store.plan("fw:nation", s"$base/src")
    val read2 = store.read(plan2, "parquet")
    require(plan2.files.size == 1 && n1 > 0,
      s"bookmark plan2 should see exactly the new file, got ${plan2.files}")
    read1.union(read2)
  }

  /** Maintenance-compaction lifecycle (beyond-reference; the operational
    * twin of A13: incremental append WRITES small files, compaction takes
    * them back). 16 appended part-files → a YAML `job.type: maintenance`
    * run through the REAL engine (`{target_dir}` interpolation included)
    * → exactly 2, atomically swapped; the oracle proves content survived
    * byte-for-byte, the requires pin the file counts. */
  private def fwCompact(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "compact")
    rmrf(s, base)
    s.read.parquet(s"$d/lineitem.parquet")
      .filter(col("l_orderkey") % 7 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("price_cents"))
      .repartition(16)
      .write.parquet(s"$base/t")
    def nFiles: Long = {
      val p = new org.apache.hadoop.fs.Path(s"$base/t")
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.listStatus(p).count(st => st.getPath.getName.startsWith("part-")).toLong
    }
    val before = nFiles
    val job = ConfigParser.parse(
      s"""job:
         |  name: fw-compact
         |  type: maintenance
         |variables:
         |  default:
         |    target_dir: $base
         |maintenance:
         |  action: compact
         |  location: "{target_dir}/t"
         |  format: parquet
         |  files: "2"
         |""".stripMargin)
    Engine.run(s, job, "default")
    require(before == 16 && nFiles == 2,
      s"compact: expected 16 -> 2 part-files, got $before -> $nFiles")
    s.read.parquet(s"$base/t")
  }

  /** Z-order clustering lifecycle (beyond-reference): stage a randomly-
    * laid-out table, cluster it on (l_partkey, l_suppkey) through the
    * YAML maintenance path, then REQUIRE the layout contract — exactly
    * `files` part-files whose recomputed Z-ranges are pairwise disjoint
    * (that disjointness is what lets file min/max stats prune scans on
    * either clustered column). The oracle proves the rewrite moved
    * bytes, not values. */
  private def fwCluster(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "cluster")
    rmrf(s, base)
    s.read.parquet(s"$d/lineitem.parquet")
      .filter(col("l_orderkey") % 5 === 0)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("price_cents"))
      .repartition(8) // round-robin: deliberately locality-free layout
      .write.parquet(s"$base/t")
    val job = ConfigParser.parse(
      s"""job:
         |  name: fw-cluster
         |  type: maintenance
         |variables:
         |  default:
         |    target_dir: $base
         |maintenance:
         |  action: cluster
         |  location: "{target_dir}/t"
         |  format: parquet
         |  cluster_by: l_partkey, l_suppkey
         |  files: "4"
         |""".stripMargin)
    Engine.run(s, job, "default")
    // capture the file name BEFORE zOrdered's stats cross-join —
    // input_file_name() refuses a multi-source plan
    val tagged = s.read.parquet(s"$base/t").withColumn("__f", input_file_name())
    val ranges = graft.sinks.Sinks.zOrdered(tagged, Seq("l_partkey", "l_suppkey"))
      .groupBy(col("__f"))
      .agg(min(col("__z")).as("lo"), max(col("__z")).as("hi"))
      .orderBy(col("lo"))
      .collect() // nFiles rows — metadata-sized, not data-sized
    require(ranges.length == 4,
      s"cluster: expected 4 part-files, got ${ranges.length}")
    ranges.sliding(2).foreach {
      case Array(a, b) => require(a.getAs[Long]("hi") <= b.getAs[Long]("lo"),
        s"cluster: overlapping Z-ranges [${a.getAs[Long]("lo")},${a.getAs[Long]("hi")}] " +
          s"vs [${b.getAs[Long]("lo")},${b.getAs[Long]("hi")}]")
      case _ => ()
    }
    s.read.parquet(s"$base/t")
  }

  /** Hilbert-curve clustering (r11 verdict #7) — `fw_cluster`'s sibling
    * through `maintenance.curve: hilbert`: same staged-rewrite +
    * atomic-swap shape, the unit-step Hilbert position replacing the
    * Z-interleave (better per-file locality at skewed aspect ratios —
    * the curve law itself is pinned in HilbertIndexSpec). The REQUIRE
    * mirrors fw_cluster: each rewritten part-file must hold a DISJOINT
    * Hilbert range; the both-column pruning contract lives in
    * SinksSpec's hilbert test. */
  private def fwHilbert(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "hilbert")
    rmrf(s, base)
    s.read.parquet(s"$d/lineitem.parquet")
      .filter(col("l_orderkey") % 5 === 0)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("price_cents"))
      .repartition(8) // round-robin: deliberately locality-free layout
      .write.parquet(s"$base/t")
    val job = ConfigParser.parse(
      s"""job:
         |  name: fw-hilbert
         |  type: maintenance
         |maintenance:
         |  action: cluster
         |  curve: hilbert
         |  location: $base/t
         |  format: parquet
         |  cluster_by: l_partkey, l_suppkey
         |  files: "4"
         |""".stripMargin)
    Engine.run(s, job, "default")
    val tagged = s.read.parquet(s"$base/t").withColumn("__f", input_file_name())
    val ranges = graft.sinks.Sinks.hilbertOrdered(tagged, Seq("l_partkey", "l_suppkey"))
      .groupBy(col("__f"))
      .agg(min(col("__z")).as("lo"), max(col("__z")).as("hi"))
      .orderBy(col("lo"))
      .collect() // nFiles rows — metadata-sized, not data-sized
    require(ranges.length == 4,
      s"hilbert: expected 4 part-files, got ${ranges.length}")
    ranges.sliding(2).foreach {
      case Array(a, b) => require(a.getAs[Long]("hi") <= b.getAs[Long]("lo"),
        s"hilbert: overlapping ranges [${a.getAs[Long]("lo")},${a.getAs[Long]("hi")}] " +
          s"vs [${b.getAs[Long]("lo")},${b.getAs[Long]("hi")}]")
      case _ => ()
    }
    s.read.parquet(s"$base/t")
  }

  /** Sorted-writes lifecycle (beyond-reference): `sort_by:` orders rows
    * WITHIN each written file, so parquet row-group min/max stats prune
    * range scans on the sort key — the free storage index every
    * time-partitioned 100 TB table wants. The require reads each part
    * file INDIVIDUALLY and checks it is sorted; the oracle proves the
    * content is untouched by the layout change. */
  private def fwSortby(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "sortby")
    rmrf(s, base)
    run(s,
      s"""job:
         |  name: fw-sortby
         |  type: spark-sql
         |input_tables:
         |  - name: orders
         |    source: s3
         |    location: $d/orders.parquet
         |output_table:
         |  name: so_out
         |  target: s3
         |  location: $base/out
         |  repartition: "4"
         |  sort_by: o_orderdate,o_orderkey
         |sql: SELECT o_orderkey, o_orderdate, floor(o_totalprice * 100 + 0.5) AS price_cents FROM orders
         |""".stripMargin)
    val p = new org.apache.hadoop.fs.Path(s"$base/out")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(p).map(_.getPath.toString).filter(_.contains("part-"))
    require(parts.length > 1, s"sort_by check needs several files, got ${parts.length}")
    parts.foreach { f =>
      val seq = s.read.parquet(f)
        .select(col("o_orderdate").cast("string"), col("o_orderkey"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      require(seq == seq.sorted, s"part file $f is not sorted by (o_orderdate, o_orderkey)")
    }
    s.read.parquet(s"$base/out")
  }

  /** Manifest-carrying publish (beyond-reference): `manifest: true`
    * writes `_graft_manifest.json` into the table during the STAGED
    * publish, so table and manifest swap in atomically. The requires
    * hold the manifest to the filesystem truth — row count, file list,
    * byte sizes — and prove Spark readers ignore the underscore file;
    * the oracle proves the data itself is untouched. */
  private def fwManifest(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "manifest")
    rmrf(s, base)
    run(s,
      s"""job:
         |  name: fw-manifest
         |  type: spark-sql
         |input_tables:
         |  - name: orders
         |    source: s3
         |    location: $d/orders.parquet
         |output_table:
         |  name: mf_out
         |  target: s3
         |  location: $base/out
         |  repartition: "3"
         |  manifest: "true"
         |sql: SELECT o_orderkey, o_custkey, floor(o_totalprice * 100 + 0.5) AS price_cents FROM orders WHERE o_orderkey % 3 = 0
         |""".stripMargin)
    val p = new org.apache.hadoop.fs.Path(s"$base/out")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val mPath = new org.apache.hadoop.fs.Path(p, "_graft_manifest.json")
    require(fs.exists(mPath), "manifest: _graft_manifest.json missing after publish")
    val json = {
      val in = fs.open(mPath)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    def longField(k: String): Long =
      s""""$k":(\\d+)""".r.findFirstMatchIn(json)
        .map(_.group(1).toLong)
        .getOrElse(sys.error(s"manifest: field $k missing in $json"))
    val actualFiles = fs.listStatus(p)
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .map(st => st.getPath.getName -> st.getLen).toMap
    val back = s.read.parquet(s"$base/out")
    require(longField("row_count") == back.count(),
      s"manifest row_count ${longField("row_count")} != table ${back.count()}")
    require(longField("n_files") == actualFiles.size && actualFiles.size == 3,
      s"manifest n_files ${longField("n_files")} vs fs ${actualFiles.size}")
    require(longField("total_bytes") == actualFiles.values.sum,
      "manifest total_bytes != sum of part-file sizes")
    actualFiles.foreach { case (name, bytes) =>
      require(json.contains(s""""name":"$name","bytes":$bytes"""),
        s"manifest missing file entry $name ($bytes bytes)")
    }
    back
  }

  /** Data-quality-gated publish (beyond-reference): the job declares
    * `dq_checks` (min_rows, not_null, unique) on its output; the engine
    * evaluates them in one aggregate pass and only then writes. A second
    * run with a violated check (planted null in a not_null column) must
    * FAIL with a named error and leave the first run's output untouched —
    * the A15 contract extended to "no invalid output". */
  private def fwDq(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "dq")
    rmrf(s, base)
    def yaml(sql: String) =
      s"""job:
         |  name: fw-dq
         |  type: spark-sql
         |input_tables:
         |  - name: nation
         |    source: s3
         |    location: $d/nation.parquet
         |output_table:
         |  name: dq_out
         |  target: s3
         |  location: $base/out
         |  dq_checks:
         |    min_rows: "20"
         |    not_null: n_name,n_regionkey
         |    unique: n_nationkey
         |sql: $sql
         |""".stripMargin
    run(s, yaml("SELECT n_nationkey, n_name, n_regionkey FROM nation"))
    val good = s.read.parquet(s"$base/out")
    val goodCount = good.count()
    // violating run: same target, planted null in a not_null column
    val failed =
      try { run(s, yaml(
        "SELECT n_nationkey, CASE WHEN n_nationkey = 3 THEN NULL ELSE n_name END AS n_name, n_regionkey FROM nation")); false }
      catch { case e: graft.config.ConfigError =>
        require(e.getMessage.contains("not_null(n_name)"), s"wrong DQ error: ${e.getMessage}")
        true }
    require(failed, "violating run must fail its dq_checks")
    require(s.read.parquet(s"$base/out").count() == goodCount,
      "failed run must leave the previous output untouched")
    good
  }

  /** Column-profiling maintenance job (beyond-reference; the Glue-crawler
    * statistics pass): `maintenance.action: profile` reads the target,
    * computes per-column stats in one aggregation, writes the stats
    * table, and the oracle recomputes every statistic per column. */
  private def fwProfile(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "profile")
    rmrf(s, base)
    val job = ConfigParser.parse(
      s"""job:
         |  name: fw-profile
         |  type: maintenance
         |maintenance:
         |  action: profile
         |  location: $d/nation.parquet
         |  output: $base/stats
         |""".stripMargin)
    Engine.run(s, job, "default")
    s.read.parquet(s"$base/stats")
  }

  /** Staging-debris vacuum job: plant an orphan `.t.__staging__` dir
    * (what a kill AFTER publish leaves behind) next to the live table,
    * vacuum the parent through the YAML path — the orphan goes, the
    * table is untouched, and a second pass is a no-op. (An orphan with
    * NO live sibling is a crash-recovery candidate and is kept —
    * SinksSpec covers that branch.) */
  private def fwVacuum(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "vacuum")
    rmrf(s, base)
    s.read.parquet(s"$d/region.parquet").write.parquet(s"$base/t")
    // the orphan a killed publish leaves: staged bytes, never cleaned
    s.read.parquet(s"$d/region.parquet").write.parquet(s"$base/.t.__staging__")
    def orphans: Int = new java.io.File(base).listFiles()
      .count(_.getName.endsWith(".__staging__"))
    require(orphans == 1, s"expected 1 planted orphan, got $orphans")
    val job = ConfigParser.parse(
      s"""job:
         |  name: fw-vacuum
         |  type: maintenance
         |maintenance:
         |  action: vacuum
         |  location: $base
         |""".stripMargin)
    Engine.run(s, job, "default")
    Engine.run(s, job, "default") // idempotent no-op
    require(orphans == 0, "vacuum left the orphan behind")
    s.read.parquet(s"$base/t")
  }

  /** Corrupt-shard tolerance through the A1 `format_options`
    * passthrough: a junk file planted in the table directory is skipped
    * under `ignoreCorruptFiles` (a per-read file-source option — no
    * session-wide conf mutation), and the scan returns exactly the
    * intact rows. The production failure this pins: one truncated
    * upload in a million-file 100 TB table must degrade to a logged
    * skip, not kill the job. */
  private def fwCorrupt(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "corrupt")
    rmrf(s, base)
    s.read.parquet(s"$d/nation.parquet").write.parquet(s"$base/t")
    // a parquet-named file with a garbage footer — a truncated upload
    val junk = new java.io.FileOutputStream(s"$base/t/part-junk.parquet")
    junk.write("this is not a parquet file".getBytes("UTF-8")); junk.close()
    val yaml =
      s"""job:
         |  name: fw-corrupt
         |  type: spark-sql
         |input_tables:
         |  - name: nation
         |    source: s3
         |    location: $base/t
         |    format: parquet
         |    format_options:
         |      ignoreCorruptFiles: "true"
         |output_table:
         |  name: survivors
         |  target: s3
         |  location: $base/out
         |  format: parquet
         |  refresh: full
         |sql: SELECT n_nationkey, n_name, n_regionkey FROM nation
         |""".stripMargin
    run(s, yaml)
    s.read.parquet(s"$base/out")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
  }

  /** Malformed-row quarantine (`quarantine:` input key, beyond-reference):
    * nation staged as headerless pipe-csv with three planted bad lines
    * (token-count short, type failure, token-count long). The engine run
    * must (a) register only the rows that parse — the job's SQL sees a
    * clean table — and (b) land every malformed RAW line in the
    * quarantine path. The result frame unions both sides so the oracle
    * checks the split exactly: survivors must equal nation, and the
    * quarantine must hold exactly the planted lines (as constants the
    * oracle replays with VALUES). */
  private def fwQuarantine(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "quarantine")
    rmrf(s, base)
    s.read.parquet(s"$d/nation.parquet")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .write.option("sep", "|").csv(s"$base/t")
    val junk = new java.io.FileOutputStream(s"$base/t/part-badlines.csv")
    junk.write("999|TOOFEW\n998|BADTYPE|notanint\n997|ok|3|extra\n".getBytes("UTF-8"))
    junk.close()
    val yaml =
      s"""job:
         |  name: fw-quarantine
         |  type: spark-sql
         |input_tables:
         |  - name: nation
         |    source: s3
         |    location: $base/t
         |    format: csv
         |    format_options:
         |      separator: "|"
         |    schema: "n_nationkey INT, n_name STRING, n_regionkey INT"
         |    quarantine: $base/quarantined
         |output_table:
         |  name: survivors
         |  target: s3
         |  location: $base/out
         |  format: parquet
         |  refresh: full
         |sql: SELECT n_nationkey, n_name, n_regionkey FROM nation
         |""".stripMargin
    run(s, yaml)
    s.read.parquet(s"$base/out")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .unionByName(
        s.read.parquet(s"$base/quarantined")
          .select(lit(-1).cast("int").as("n_nationkey"),
            col("raw_record").as("n_name"),
            lit(-1).cast("int").as("n_regionkey")))
  }

  /** Schema evolution through the A1 `format_options` passthrough: a
    * table whose later shards carry an extra column reads as ONE evolved
    * schema under `mergeSchema` (older rows null-padded) — the additive-
    * column lake migration, with zero rewrite of existing shards.
    * Without the option the scan would take whichever single footer it
    * sampled first; the test is that the declared config surface makes
    * the union deterministic. */
  private def fwEvolution(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "evolution")
    rmrf(s, base)
    val nation = s.read.parquet(s"$d/nation.parquet")
    nation.filter(col("n_nationkey") < 10)
      .select(col("n_nationkey"), col("n_name"))
      .write.parquet(s"$base/t")
    nation.filter(col("n_nationkey") >= 10)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .write.mode("append").parquet(s"$base/t")
    val yaml =
      s"""job:
         |  name: fw-evolution
         |  type: spark-sql
         |input_tables:
         |  - name: evolved
         |    source: s3
         |    location: $base/t
         |    format: parquet
         |    format_options:
         |      mergeSchema: "true"
         |output_table:
         |  name: evolved_out
         |  target: s3
         |  location: $base/out
         |  format: parquet
         |  refresh: full
         |sql: SELECT n_nationkey, n_name, n_regionkey FROM evolved
         |""".stripMargin
    run(s, yaml)
    s.read.parquet(s"$base/out")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
  }

  /** Partition-retention maintenance job (beyond-reference; the lake
    * housekeeping pass): stage orders partitioned by priority, expire
    * everything below '3' through the YAML engine path (run TWICE —
    * retention must be idempotent), and return the survivors. The
    * '4-NOT SPECIFIED' partition exercises the URL-encoded directory
    * name (space -> %20) on both the drop-compare and read-back sides. */
  private def fwRetention(s: SparkSession, d: String): DataFrame = {
    val base = scratch(d, "retention")
    rmrf(s, base)
    s.read.parquet(s"$d/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("price_cents"),
        col("o_orderpriority"))
      .write.partitionBy("o_orderpriority").parquet(s"$base/t")
    val job = ConfigParser.parse(
      s"""job:
         |  name: fw-retention
         |  type: maintenance
         |variables:
         |  default:
         |    cutoff: "3"
         |maintenance:
         |  action: retain
         |  location: $base/t
         |  partition_col: o_orderpriority
         |  keep_from: "{cutoff}"
         |""".stripMargin)
    Engine.run(s, job, "default")
    Engine.run(s, job, "default") // idempotent: second pass drops nothing
    s.read.parquet(s"$base/t")
      .select(col("o_orderkey"), col("o_custkey"), col("price_cents"),
        col("o_orderpriority"))
  }

  val all: Seq[(String, Q)] = Seq(
    "fw_lifecycle" -> Q(fwLifecycle, Some(
      """SELECT r.r_name,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(floor(o.o_totalprice * 100 + 0.5)) AS BIGINT) AS revenue_cents
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE o.o_totalprice > 0
        |GROUP BY r.r_name""".stripMargin)),
    "fw_sql_file" -> Q(fwSqlFile, Some(
      "SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations FROM nation GROUP BY n_regionkey")),
    "fw_sketch" -> Q(fwSketch, Some(OracleSql.HeavyHittersBigrams)),
    "fw_incremental" -> Q(fwIncremental, Some(
      """SELECT n_nationkey, n_name FROM nation
        |UNION ALL
        |SELECT n_nationkey, n_name FROM nation""".stripMargin)),
    "fw_dyn_overwrite" -> Q(fwDynOverwrite, Some(
      """SELECT o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN 0
        |            ELSE sum(floor(o_totalprice * 100 + 0.5)) END AS BIGINT) AS sum_cents
        |FROM orders GROUP BY o_orderpriority""".stripMargin)),
    "fw_filecount" -> Q(fwFilecount, Some(
      """SELECT 'repartition_wins_files' AS metric, CAST(3 AS BIGINT) AS value
        |UNION ALL
        |SELECT 'coalesce_files' AS metric, CAST(2 AS BIGINT) AS value""".stripMargin)),
    "fw_lineage" -> Q(fwLineage, Some(
      """SELECT 'key_sum' AS output_column, 'nation' AS source_table, 'n_nationkey' AS source_column
        |UNION ALL SELECT 'key_sum', 'nation', 'n_regionkey'
        |UNION ALL SELECT 'region_name', 'region', 'r_name'""".stripMargin)),
    "fw_observe" -> Q(fwObserve, Some(
      """SELECT 'n_rows' AS metric, CAST(count(*) AS BIGINT) AS value FROM customer
        |UNION ALL
        |SELECT 'nonnull_cents', CAST(count(*) AS BIGINT) FROM customer
        |UNION ALL
        |SELECT 'nonnull_seg', CAST(count(*) AS BIGINT) FROM customer
        |WHERE c_custkey % 5 <> 0""".stripMargin)),
    "fw_scd2" -> Q(fwScd2, Some(
      """WITH snap AS (
        |  SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
        |  FROM customer
        |)
        |SELECT c_custkey, cents, 1 AS _valid_from_batch,
        |       CASE WHEN c_custkey % 10 = 0 OR c_custkey % 7 = 0 THEN 2 END AS _valid_to_batch,
        |       NOT (c_custkey % 10 = 0 OR c_custkey % 7 = 0) AS _is_current
        |FROM snap
        |UNION ALL
        |SELECT c_custkey, CAST(0 AS BIGINT) AS cents, 2 AS _valid_from_batch,
        |       NULL AS _valid_to_batch, true AS _is_current
        |FROM snap WHERE c_custkey % 10 = 0 AND c_custkey % 7 <> 0""".stripMargin)),
    "fw_upsert" -> Q(fwUpsert, Some(
      """SELECT c_custkey,
        |       CASE WHEN c_custkey % 10 = 0 THEN 0
        |            ELSE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) END AS cents,
        |       CASE WHEN c_custkey % 10 = 0 THEN 'v2' ELSE 'v1' END AS version
        |FROM customer
        |UNION ALL SELECT -1, 0, 'v2'""".stripMargin)),
    "fw_stream_acid" -> Q(fwStreamAcid, Some(
      """SELECT doc_id, source, lang, n_chars
        |FROM documents WHERE n_chars >= 300""".stripMargin)),
    "fw_update_vectors" -> Q(fwUpdateVectors, Some(
      """SELECT c_custkey,
        |       CASE WHEN c_mktsegment = 'MACHINERY'
        |            THEN CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) // 2
        |            ELSE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) END AS cents,
        |       c_mktsegment
        |FROM customer""".stripMargin)),
    "fw_matview_inc" -> Q(fwMatviewInc, Some(
      """SELECT c_mktsegment,
        |       CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents,
        |       count(*) AS n_cust
        |FROM customer GROUP BY c_mktsegment""".stripMargin)),
    "fw_matview" -> Q(fwMatview, Some(
      """SELECT c_mktsegment, count(*) AS n_cust,
        |       CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM customer GROUP BY c_mktsegment""".stripMargin)),
    "fw_stream_wap" -> Q(fwStreamWap, Some(
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE n_chars >= 300""".stripMargin)),
    "fw_stream_mask" -> Q(fwStreamMask, Some(
      """SELECT c_custkey,
        |       substring(sha256('graft-mask-v1:' || c_name), 1, 16) AS c_name,
        |       c_mktsegment
        |FROM customer""".stripMargin)),
    "fw_mask" -> Q(fwMask, Some(
      """SELECT c_custkey,
        |       substring(sha256('graft-mask-v1:' || c_name), 1, 16) AS c_name,
        |       repeat('*', greatest(length(c_mktsegment) - 4, 0)) || right(c_mktsegment, 4) AS c_mktsegment,
        |       CAST(NULL AS DOUBLE) AS c_acctbal
        |FROM customer""".stripMargin)),
    "fw_version_diff" -> Q(fwVersionDiff, Some(
      """SELECT c_custkey, 0 AS cents, c_mktsegment, 'insert' AS _change_type
        |FROM customer
        |WHERE c_custkey % 2 = 0 AND c_mktsegment = 'FURNITURE'
        |  AND CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) <> 0
        |UNION ALL
        |SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
        |       c_mktsegment, 'delete' AS _change_type
        |FROM customer
        |WHERE c_custkey % 2 = 0 AND c_mktsegment = 'FURNITURE'
        |  AND CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) <> 0""".stripMargin)),
    "fw_dv_compact" -> Q(fwDvCompact, Some(
      """SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
        |       c_mktsegment
        |FROM customer
        |WHERE NOT (c_custkey % 2 = 0 AND c_mktsegment <> 'BUILDING')
        |  AND NOT (c_custkey % 2 = 1 AND c_mktsegment = 'MACHINERY')""".stripMargin)),
    "fw_tpch_refresh" -> Q(fwTpchRefresh, Some(
      """WITH rf AS (
        |  SELECT * FROM (
        |    SELECT l_orderkey, l_quantity, l_extendedprice, l_discount,
        |           l_tax, l_returnflag, l_linestatus, l_shipdate
        |    FROM lineitem
        |    UNION ALL
        |    SELECT l_orderkey + 20000000, l_quantity, l_extendedprice, l_discount,
        |           l_tax, l_returnflag, l_linestatus, l_shipdate
        |    FROM lineitem WHERE l_orderkey % 97 = 0)
        |  WHERE l_orderkey % 89 <> 0)
        |SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       count(*) AS count_order
        |FROM rf GROUP BY l_returnflag, l_linestatus""".stripMargin)),
    "fw_wap" -> Q(fwWap, Some(
      """SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
        |       c_mktsegment
        |FROM customer
        |WHERE floor(c_acctbal * 100 + 0.5) >= 0""".stripMargin)),
    "fw_delete_vectors" -> Q(fwDeleteVectors, Some(
      """SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
        |       c_mktsegment
        |FROM customer
        |WHERE NOT (floor(c_acctbal * 100 + 0.5) < 0)
        |  AND c_mktsegment <> 'BUILDING'""".stripMargin)),
    "fw_acid" -> Q(fwAcid, Some(
      """SELECT c_custkey,
        |       CASE WHEN c_custkey % 10 = 0 THEN 0
        |            ELSE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) END AS cents,
        |       CASE WHEN c_custkey % 10 = 0 THEN 'v3'
        |            WHEN c_custkey % 2 = 0 THEN 'v1' ELSE 'v2' END AS version
        |FROM customer""".stripMargin)),
    "fw_restore" -> Q(fwRestore, Some(
      """SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
        |       'good' AS version
        |FROM customer WHERE c_custkey % 2 = 0""".stripMargin)),
    "fw_stream_metrics" -> Q(fwStreamMetrics, Some(
      """WITH mx AS (
        |  SELECT (epoch_ns(max(ts)) // 1000000) - 3600000 AS wm_ms FROM events
        |)
        |SELECT date_trunc('hour', ts) AS window_start,
        |       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
        |       event_type, count(*) AS n_events,
        |       CAST(sum(floor(value * 100 + 0.5)) AS BIGINT) AS value_cents
        |FROM events, mx
        |WHERE (epoch_ns(date_trunc('hour', ts) + INTERVAL 1 HOUR) // 1000000) <= wm_ms
        |GROUP BY 1, 2, 3""".stripMargin)),
    "fw_atomic_sink" -> Q(fwAtomicSink, Some(
      """SELECT c_custkey,
        |       CASE WHEN c_custkey % 10 = 0 THEN 0
        |            ELSE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) END AS cents,
        |       CASE WHEN c_custkey % 10 = 0 THEN 'v2' ELSE 'v1' END AS version
        |FROM customer""".stripMargin)),
    "fw_lockfile_commit" -> Q(fwLockfileCommit, Some(
      """SELECT c_custkey,
        |       CASE WHEN c_custkey % 10 = 0 THEN 0
        |            ELSE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) END AS cents,
        |       CASE WHEN c_custkey % 10 = 0 THEN 'v3'
        |            WHEN c_custkey % 2 = 0 THEN 'v1' ELSE 'v2' END AS version
        |FROM customer""".stripMargin)),
    "fw_timetravel_ts" -> Q(fwTimetravelTs, Some(
      """SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
        |       CASE WHEN c_custkey % 2 = 0 THEN 'v1' ELSE 'v2' END AS version
        |FROM customer""".stripMargin)),
    "fw_version_vacuum" -> Q(fwVersionVacuum, Some(
      """SELECT c_custkey,
        |       CASE WHEN c_custkey % 10 = 0 THEN 0
        |            ELSE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) END AS cents,
        |       CASE WHEN c_custkey % 10 = 0 THEN 'v3'
        |            WHEN c_custkey % 2 = 0 THEN 'v1' ELSE 'v2' END AS version
        |FROM customer""".stripMargin)),
    "fw_timetravel" -> Q(fwTimetravel, Some(
      """SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
        |       CASE WHEN c_custkey % 2 = 0 THEN 'v1' ELSE 'v2' END AS version
        |FROM customer""".stripMargin)),
    "fw_stream_zonemap" -> Q(fwStreamZonemap, Some(
      """SELECT doc_id, source, lang, n_chars
        |FROM documents WHERE doc_id < 60""".stripMargin)),
    "fw_zonemap" -> Q(fwZonemap, Some(
      """SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
        |       c_mktsegment
        |FROM customer WHERE c_custkey <= 20""".stripMargin)),
    "fw_changes" -> Q(fwChanges, Some(
      """SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
        |       CAST(2 AS BIGINT) AS _commit_version
        |FROM customer WHERE c_custkey % 3 = 1
        |UNION ALL
        |SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
        |       CAST(3 AS BIGINT) AS _commit_version
        |FROM customer WHERE c_custkey % 3 = 2""".stripMargin)),
    "fw_prune_input" -> Q(fwPruneInput, Some(
      """SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
        |       c_mktsegment
        |FROM customer
        |WHERE c_custkey <= 40 AND c_mktsegment = 'BUILDING'""".stripMargin)),
    "fw_merge_pruned" -> Q(fwMergePruned, Some(
      """SELECT c_custkey,
        |       CASE WHEN c_custkey <= 20 THEN 0
        |            ELSE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) END AS cents,
        |       CASE WHEN c_custkey <= 20 THEN 'v2' ELSE 'v1' END AS version
        |FROM customer""".stripMargin)),
    "fw_merge_sql" -> Q(fwMergeSql, Some(
      """SELECT c_custkey,
        |       CASE WHEN c_custkey <= 20 THEN 0
        |            ELSE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) END AS cents,
        |       CASE WHEN c_custkey <= 20 THEN 'v2' ELSE 'v1' END AS version
        |FROM customer""".stripMargin)),
    // closed-form replay of both conditional merges: merge 1 first-
    // action-wins (BUILDING delete > cents update) + conditional
    // insert; merge 2 marks source-absent negative rows 'stale'
    "fw_merge_conditional" -> Q(fwMergeConditional, Some(
      """WITH t1 AS (
        |  SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
        |         c_mktsegment AS seg, 'v1' AS version
        |  FROM customer WHERE c_custkey % 2 = 0
        |), s1 AS (
        |  SELECT c_custkey, CAST(floor(c_acctbal * 50 + 0.5) AS BIGINT) AS cents,
        |         c_mktsegment AS seg, 'v2' AS version
        |  FROM customer WHERE c_custkey <= 60
        |), m1 AS (
        |  SELECT t.c_custkey,
        |         CASE WHEN s.c_custkey IS NOT NULL AND s.cents > t.cents
        |              THEN s.cents ELSE t.cents END AS cents,
        |         t.seg,
        |         CASE WHEN s.c_custkey IS NOT NULL AND s.cents > t.cents
        |              THEN 'upd' ELSE t.version END AS version
        |  FROM t1 t LEFT JOIN s1 s ON t.c_custkey = s.c_custkey
        |  WHERE s.c_custkey IS NULL OR s.seg <> 'BUILDING'
        |  UNION ALL
        |  SELECT s.c_custkey, s.cents, s.seg, s.version
        |  FROM s1 s LEFT JOIN t1 t ON t.c_custkey = s.c_custkey
        |  WHERE t.c_custkey IS NULL AND s.cents >= 0
        |)
        |SELECT m.c_custkey, m.cents, m.seg,
        |       CASE WHEN s.c_custkey IS NULL AND m.cents < 0
        |            THEN 'stale' ELSE m.version END AS version
        |FROM m1 m LEFT JOIN s1 s ON m.c_custkey = s.c_custkey""".stripMargin)),
    "fw_dml_sql" -> Q(fwDmlSql, Some(
      """SELECT c_custkey,
        |       CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
        |         + CASE WHEN c_mktsegment = 'BUILDING' THEN 100 ELSE 0 END AS cents,
        |       c_mktsegment
        |FROM customer
        |WHERE floor(c_acctbal * 100 + 0.5) >= 0""".stripMargin)),
    "fw_history" -> Q(fwHistory, Some(
      """SELECT CAST(1 AS BIGINT) AS version, 'overwrite' AS mode,
        |       CAST(2 AS BIGINT) AS n_files,
        |       (SELECT count(*) FROM customer WHERE c_custkey % 3 = 0) AS n_rows
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 'append', CAST(4 AS BIGINT),
        |       (SELECT count(*) FROM customer WHERE c_custkey % 3 <= 1)
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), 'append', CAST(6 AS BIGINT),
        |       (SELECT count(*) FROM customer)""".stripMargin)),
    "fw_upsert_pruned" -> Q(fwUpsertPruned, Some(
      """SELECT c_custkey,
        |       CASE WHEN c_custkey % 10 = 0 THEN 0
        |            ELSE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) END AS cents,
        |       CASE WHEN c_custkey % 10 = 0 THEN 'v2' ELSE 'v1' END AS version,
        |       CASE WHEN c_custkey % 10 = 0 THEN 'BUILDING'
        |            ELSE c_mktsegment END AS c_mktsegment
        |FROM customer
        |UNION ALL SELECT -1, 0, 'v2', 'BUILDING'""".stripMargin)),
    "fw_bucket" -> Q(fwBucket, Some(
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(floor(o_totalprice * 100 + 0.5)) AS BIGINT) AS total_cents
        |FROM orders GROUP BY o_custkey""".stripMargin)),
    "fw_catalog" -> Q(fwCatalog, Some(
      """SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
        |       CAST(sum(floor(s_acctbal * 100 + 0.5)) AS BIGINT) AS acctbal_cents
        |FROM supplier GROUP BY s_nationkey""".stripMargin)),
    "fw_jdbc" -> Q(fwJdbc, Some(
      "SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations FROM nation GROUP BY n_regionkey")),
    "fw_script" -> Q(fwScript, Some(
      """SELECT n_nationkey, n_name, CAST(n_nationkey * 2 AS BIGINT) AS doubled
        |FROM nation WHERE n_regionkey = 2""".stripMargin)),
    "fw_script_jar" -> Q(fwScriptJar, Some(
      """SELECT n_nationkey, n_name, CAST(length(n_name) * 3 + 1 AS BIGINT) AS score
        |FROM nation WHERE n_regionkey < 3""".stripMargin)),
    "fw_schema" -> Q(fwSchema, Some(
      """SELECT n_regionkey AS rkey, CAST(count(*) AS BIGINT) AS n_nations,
        |       min(n_name) AS first_name
        |FROM nation GROUP BY n_regionkey""".stripMargin)),
    "fw_bookmark" -> Q(fwBookmark, Some(
      "SELECT * FROM nation UNION ALL SELECT * FROM nation")),
    "fw_stream" -> Q(fwStream, Some(
      """SELECT doc_id, source, lang, n_chars
        |FROM documents WHERE n_chars >= 300""".stripMargin)),
    "fw_dq" -> Q(fwDq, Some(
      "SELECT n_nationkey, n_name, n_regionkey FROM nation")),
    "fw_profile" -> Q(fwProfile, Some(
      """SELECT 'n_nationkey' AS col_name, count(*) AS n_rows,
        |       CAST(sum(CASE WHEN n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |       CAST(count(DISTINCT n_nationkey) AS BIGINT) AS n_distinct,
        |       CAST(min(n_nationkey) AS VARCHAR) AS min_value,
        |       CAST(max(n_nationkey) AS VARCHAR) AS max_value
        |FROM nation
        |UNION ALL
        |SELECT 'n_name', count(*),
        |       CAST(sum(CASE WHEN n_name IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |       CAST(count(DISTINCT n_name) AS BIGINT),
        |       CAST(min(n_name) AS VARCHAR), CAST(max(n_name) AS VARCHAR)
        |FROM nation
        |UNION ALL
        |SELECT 'n_regionkey', count(*),
        |       CAST(sum(CASE WHEN n_regionkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |       CAST(count(DISTINCT n_regionkey) AS BIGINT),
        |       CAST(min(n_regionkey) AS VARCHAR), CAST(max(n_regionkey) AS VARCHAR)
        |FROM nation""".stripMargin)),
    "fw_sortby" -> Q(fwSortby, Some(
      """SELECT o_orderkey, o_orderdate,
        |       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
        |FROM orders""".stripMargin)),
    "fw_vacuum" -> Q(fwVacuum, Some(
      "SELECT r_regionkey, r_name FROM region")),
    "fw_corrupt" -> Q(fwCorrupt, Some(
      "SELECT n_nationkey, n_name, n_regionkey FROM nation")),
    "fw_quarantine" -> Q(fwQuarantine, Some(
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |UNION ALL
        |SELECT CAST(-1 AS INT), v.raw, CAST(-1 AS INT) FROM (VALUES
        |  ('999|TOOFEW'), ('998|BADTYPE|notanint'), ('997|ok|3|extra')) v(raw)""".stripMargin)),
    "fw_evolution" -> Q(fwEvolution, Some(
      """SELECT n_nationkey, n_name,
        |       CASE WHEN n_nationkey < 10 THEN NULL ELSE n_regionkey END AS n_regionkey
        |FROM nation""".stripMargin)),
    "fw_retention" -> Q(fwRetention, Some(
      """SELECT o_orderkey, o_custkey,
        |       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
        |       o_orderpriority
        |FROM orders WHERE o_orderpriority >= '3'""".stripMargin)),
    "fw_compact" -> Q(fwCompact, Some(
      """SELECT l_orderkey, l_linenumber,
        |       CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents
        |FROM lineitem WHERE l_orderkey % 7 = 0""".stripMargin)),
    "fw_manifest" -> Q(fwManifest, Some(
      """SELECT o_orderkey, o_custkey,
        |       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
        |FROM orders WHERE o_orderkey % 3 = 0""".stripMargin)),
    "fw_cluster" -> Q(fwCluster, Some(
      """SELECT l_orderkey, l_partkey, l_suppkey,
        |       CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents
        |FROM lineitem WHERE l_orderkey % 5 = 0""".stripMargin)),
    "fw_hilbert" -> Q(fwHilbert, Some(
      """SELECT l_orderkey, l_partkey, l_suppkey,
        |       CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents
        |FROM lineitem WHERE l_orderkey % 5 = 0""".stripMargin)),
    "fw_formats" -> Q(fwFormats, Some(
      """SELECT r.r_name, CAST(count(*) AS BIGINT) AS n_nations,
        |       min(n.n_name) AS first_nation
        |FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name""".stripMargin)),

    "fw_xml" -> Q(fwXml, Some(
      """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
        |       CAST(count(*) AS BIGINT) AS n_nations,
        |       min(n_name) AS first_nation
        |FROM nation GROUP BY n_regionkey""".stripMargin)),

    "fw_avro" -> Q(fwAvro, Some(
      """SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations,
        |       min(n_name) AS first_nation,
        |       make_timestamp(CAST(n_regionkey AS BIGINT) * 1000000 + 1700000000000000) AS marker_ts
        |FROM nation GROUP BY n_regionkey""".stripMargin)),

    "fw_variant" -> Q(fwVariant, Some(
      """SELECT doc_id,
        |       CASE WHEN doc_id % 3 = 2 THEN 'und' ELSE lang END AS lang,
        |       CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents""".stripMargin)),

    "fw_analyze" -> Q(fwAnalyze, Some(
      """SELECT 'max_custkey' AS stat, CAST(max(c_custkey) AS BIGINT) AS value FROM customer
        |UNION ALL SELECT 'min_custkey', CAST(min(c_custkey) AS BIGINT) FROM customer
        |UNION ALL SELECT 'null_custkey', CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM customer
        |UNION ALL SELECT 'row_count', CAST(count(*) AS BIGINT) FROM customer""".stripMargin))
  )
}
