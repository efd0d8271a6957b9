package graft.config

import org.scalatest.funsuite.AnyFunSuite

class ConfigParserSpec extends AnyFunSuite {

  private val full =
    """job:
      |  name: My-Job
      |  type: spark-sql
      |  bookmark_path: /tmp/bm.json
      |  spark_config:
      |    - spark.sql.shuffle.partitions: "8"
      |    - spark.executor.memory: 2g
      |variables:
      |  prod:
      |    year: "2026"
      |  dev:
      |    year: "2001"
      |input_tables:
      |  - name: Sales
      |    source: s3
      |    location: /data/{year}/sales
      |    format: csv
      |    format_options:
      |      withHeader: "true"
      |      separator: "|"
      |  - name: Customers
      |    source: gdc
      |    database: crm
      |    table: customers_v2
      |  - name: Orders
      |    source: jdbc
      |    url: jdbc:derby:/tmp/db
      |    table: orders
      |    incremental_source: "true"
      |output_table:
      |  name: Report
      |  target: s3
      |  location: /out/{year}
      |  format: glueparquet
      |  refresh: full
      |  partition_keys: year, month
      |  repartition: "4"
      |  coalesce: "2"
      |sql: SELECT * FROM sales
      |""".stripMargin

  test("parses every README key") {
    val job = ConfigParser.parse(full)
    assert(job.name == "My-Job")
    assert(job.jobType == JobType.SparkSql)
    assert(job.bookmarkPath.contains("/tmp/bm.json"))
    assert(job.sparkConfig == Map(
      "spark.sql.shuffle.partitions" -> "8", "spark.executor.memory" -> "2g"))
    assert(job.varsFor("prod") == Map("year" -> "2026"))
    assert(job.inputTables.map(_.name) == Seq("sales", "customers", "orders"))
    val SourceSpec.File(loc, fmt, opts, _) = job.inputTables.head.source: @unchecked
    assert(loc == "/data/{year}/sales" && fmt == "csv")
    assert(opts == Map("withHeader" -> "true", "separator" -> "|"))
    val SourceSpec.Catalog(db, tbl) = job.inputTables(1).source: @unchecked
    assert(db == "crm" && tbl == "customers_v2")
    assert(job.inputTables(2).incrementalSource)
    val out = job.outputTable.get
    assert(out.name == "report")
    assert(out.format == "parquet") // glueparquet normalized (Q11)
    assert(out.partitionKeys == Seq("year", "month"))
    assert(out.repartition.contains(4) && out.coalesce.contains(2))
  }

  test("defaults: format parquet, refresh full, pipeline vars empty-ok") {
    val job = ConfigParser.parse(
      """job: {name: j, type: spark-sql}
        |input_tables:
        |  - {name: t, location: /x}
        |output_table: {name: o, location: /y}
        |sql: SELECT 1
        |""".stripMargin)
    val SourceSpec.File(_, fmt, _, _) = job.inputTables.head.source: @unchecked
    assert(fmt == "parquet")
    assert(job.outputTable.get.refresh == Refresh.Full)
    assert(job.varsFor("anything").isEmpty) // no variables section at all
  }

  test("error paths are named ConfigErrors") {
    def bad(yaml: String): String =
      intercept[ConfigError](ConfigParser.parse(yaml)).getMessage
    assert(bad("job: {name: j}") contains "job.type")
    assert(bad("job: {name: j, type: sparkle}") contains "sparkle")
    assert(bad("job: {name: j, type: spark-sql}\ninput_tables:\n  - {source: s3}") contains "name")
    assert(bad("job: {name: j, type: spark-sql}\ninput_tables:\n  - {name: t, source: s3}") contains "location")
    assert(bad("job: {name: j, type: spark-sql}\ninput_tables:\n  - {name: t, source: ftp}") contains "ftp")
  }

  test("quarantine key: parsed, and invalid combinations are named ConfigErrors") {
    def input(extra: String) =
      s"""job: {name: j, type: spark-sql}
         |input_tables:
         |  - name: t
         |    source: s3
         |    location: /x
         |$extra
         |sql: SELECT 1
         |""".stripMargin
    val ok = ConfigParser.parse(input(
      """    format: csv
        |    schema: "a INT, b STRING"
        |    quarantine: /q""".stripMargin))
    assert(ok.inputTables.head.quarantine.contains("/q"))

    def bad(extra: String): String =
      intercept[ConfigError](ConfigParser.parse(input(extra))).getMessage
    assert(bad("    format: parquet\n    quarantine: /q") contains "csv/json")
    assert(bad("    format: csv\n    quarantine: /q") contains "schema")
    assert(bad(
      """    format: csv
        |    schema: "a INT"
        |    format_options: {withHeader: "true"}
        |    quarantine: /q""".stripMargin) contains "headerless")
    assert(bad(
      """    format: csv
        |    schema: "a INT"
        |    incremental_source: "true"
        |    quarantine: /q""".stripMargin) contains "incremental_source")
  }

  test("unknown pipeline is an error when variables exist") {
    val job = ConfigParser.parse(
      "job: {name: j, type: spark-sql}\nvariables:\n  prod: {a: b}\nsql: SELECT 1")
    assert(job.varsFor("prod") == Map("a" -> "b"))
    intercept[ConfigError](job.varsFor("staging"))
  }

  test("refresh parse: full default, incremental, upsert, unknown rejected") {
    assert(Refresh.parse("") == Refresh.Full)
    assert(Refresh.parse("FULL") == Refresh.Full)
    assert(Refresh.parse("incremental") == Refresh.Incremental)
    assert(Refresh.parse("upsert") == Refresh.Upsert)
    intercept[ConfigError](Refresh.parse("merge"))
  }

  test("bucket misconfiguration fails at PARSE time") {
    def bad(yaml: String): String =
      intercept[ConfigError](ConfigParser.parse(yaml)).getMessage
    // bucket_by without buckets (and vice versa)
    assert(bad(
      """job: {name: j, type: spark-sql}
        |sql: SELECT 1
        |output_table: {name: o, target: gdc, database: db, bucket_by: k}
        |""".stripMargin) contains "together")
    assert(bad(
      """job: {name: j, type: spark-sql}
        |sql: SELECT 1
        |output_table: {name: o, target: gdc, database: db, buckets: "8"}
        |""".stripMargin) contains "together")
    // file target can't bucket (saveAsTable only)
    assert(bad(
      """job: {name: j, type: spark-sql}
        |sql: SELECT 1
        |output_table: {name: o, target: s3, location: /tmp/x, bucket_by: k, buckets: "8"}
        |""".stripMargin) contains "catalog")
    // bucketing + partitioning would break the dynamic-overwrite path
    assert(bad(
      """job: {name: j, type: spark-sql}
        |sql: SELECT 1
        |output_table: {name: o, target: gdc, database: db, bucket_by: k, buckets: "8", partition_keys: p}
        |""".stripMargin) contains "partition_keys")
    // well-formed parses
    val ok = ConfigParser.parse(
      """job: {name: j, type: spark-sql}
        |sql: SELECT 1
        |output_table: {name: o, target: gdc, database: db, bucket_by: "a, b", buckets: "16"}
        |""".stripMargin).outputTable.get
    assert(ok.bucketKeys == Seq("a", "b") && ok.buckets.contains(16))
  }

  test("streaming misconfiguration fails at PARSE time") {
    def bad(yaml: String): String =
      intercept[ConfigError](ConfigParser.parse(yaml)).getMessage
    val in = """input_tables:
               |  - {name: t, source: s3, location: /tmp/in, format: parquet, schema: "a INT"}
               |""".stripMargin
    val out = "output_table: {name: o, target: s3, location: /tmp/o, refresh: incremental}\n"
    // checkpoint required
    assert(bad(
      s"""job: {name: j, type: spark-sql, streaming: available_now}
         |${in}sql: SELECT 1
         |$out""".stripMargin) contains "checkpoint_location")
    // streaming on a non-spark-sql job would silently run as plain batch
    assert(bad(
      s"""job: {name: j, type: maintenance, streaming: available_now}
         |maintenance: {action: vacuum, location: /tmp/db}
         |""".stripMargin) contains "spark-sql only")
    // the drain writes through the sink — an output is not optional
    assert(bad(
      s"""job: {name: j, type: spark-sql, streaming: available_now, checkpoint_location: /tmp/c}
         |${in}sql: SELECT 1
         |""".stripMargin) contains "output_table")
    // schema required on streaming file inputs
    assert(bad(
      s"""job: {name: j, type: spark-sql, streaming: available_now, checkpoint_location: /tmp/c}
         |input_tables:
         |  - {name: t, source: s3, location: /tmp/in, format: parquet}
         |sql: SELECT 1
         |$out""".stripMargin) contains "schema")
    // file sources only
    assert(bad(
      s"""job: {name: j, type: spark-sql, streaming: available_now, checkpoint_location: /tmp/c}
         |input_tables:
         |  - {name: t, source: gdc, database: db}
         |sql: SELECT 1
         |$out""".stripMargin) contains "file sources only")
    // incremental_source is the batch bookmark mechanism — redundant
    assert(bad(
      s"""job: {name: j, type: spark-sql, streaming: available_now, checkpoint_location: /tmp/c}
         |input_tables:
         |  - {name: t, source: s3, location: /tmp/in, format: parquet, schema: "a INT", incremental_source: "true"}
         |sql: SELECT 1
         |$out""".stripMargin) contains "redundant")
    // full refresh would purge earlier micro-batches
    assert(bad(
      s"""job: {name: j, type: spark-sql, streaming: available_now, checkpoint_location: /tmp/c}
         |${in}sql: SELECT 1
         |output_table: {name: o, target: s3, location: /tmp/o}
         |""".stripMargin) contains "incremental")
    // unknown mode named
    assert(bad(
      s"""job: {name: j, type: spark-sql, streaming: continuous}
         |${in}sql: SELECT 1
         |$out""".stripMargin) contains "available_now")
    // well-formed parses with the streaming fields populated
    val ok = ConfigParser.parse(
      s"""job: {name: j, type: spark-sql, streaming: available_now, checkpoint_location: /tmp/c}
         |${in}sql: SELECT 1
         |$out""".stripMargin)
    assert(ok.streaming && ok.checkpointLocation.contains("/tmp/c"))
    // batch jobs are untouched: no streaming fields, no new constraints
    val batch = ConfigParser.parse(
      """job: {name: j, type: spark-sql}
        |sql: SELECT 1
        |""".stripMargin)
    assert(!batch.streaming && batch.checkpointLocation.isEmpty)
  }

  test("upsert misconfiguration fails at PARSE time, before any query runs") {
    def bad(yaml: String): String =
      intercept[ConfigError](ConfigParser.parse(yaml)).getMessage
    // catalog target can't upsert
    assert(bad(
      """job: {name: j, type: spark-sql}
        |sql: SELECT 1
        |output_table: {name: o, target: gdc, database: db, refresh: upsert, merge_keys: k}
        |""".stripMargin) contains "file targets only")
    // missing merge_keys
    assert(bad(
      """job: {name: j, type: spark-sql}
        |sql: SELECT 1
        |output_table: {name: o, target: s3, location: /tmp/x, refresh: upsert}
        |""".stripMargin) contains "merge_keys")
    // well-formed upsert parses
    val ok = ConfigParser.parse(
      """job: {name: j, type: spark-sql}
        |sql: SELECT 1
        |output_table: {name: o, target: s3, location: /tmp/x, refresh: upsert, merge_keys: k}
        |""".stripMargin)
    assert(ok.outputTable.get.mergeKeys == Seq("k"))
  }

  test("schema: optional DDL on a file input; absent elsewhere") {
    val job = ConfigParser.parse(
      """job: {name: j, type: spark-sql}
        |input_tables:
        |  - name: raw
        |    source: s3
        |    location: /tmp/in
        |    format: csv
        |    schema: "a INT, b STRING"
        |  - name: plain
        |    source: s3
        |    location: /tmp/in2
        |sql: SELECT 1
        |""".stripMargin)
    val specs = job.inputTables.map(_.source)
    assert(specs.head.asInstanceOf[SourceSpec.File].schema.contains("a INT, b STRING"))
    assert(specs(1).asInstanceOf[SourceSpec.File].schema.isEmpty)
  }

  test("script_jar key parses") {
    val job = ConfigParser.parse(
      """job: {name: j, type: script}
        |script_class: com.example.J
        |script_jar: /path/to/user.jar
        |""".stripMargin)
    assert(job.scriptJar.contains("/path/to/user.jar"))
    assert(job.scriptClass.contains("com.example.J"))
  }

  test("versioned: parses on file inputs/outputs; misconfigurations fail at PARSE time") {
    val job = ConfigParser.parse(
      """job: {name: j, type: spark-sql}
        |input_tables:
        |  - {name: snap, source: s3, location: /t, versioned: "true", as_of_version: "3"}
        |output_table: {name: o, target: s3, location: /o, versioned: "true", refresh: incremental}
        |sql: SELECT 1
        |""".stripMargin)
    assert(job.inputTables.head.source ==
      SourceSpec.Versioned("/t", "parquet", Map.empty, Some(3L)))
    assert(job.outputTable.exists(_.versioned))
    def bad(yaml: String, needle: String): Unit = {
      val e = intercept[ConfigError](ConfigParser.parse(yaml))
      assert(e.getMessage.contains(needle), s"got: ${e.getMessage}")
    }
    bad("""job: {name: j, type: spark-sql}
          |input_tables: [{name: s, source: s3, location: /t, as_of_version: "3"}]
          |sql: SELECT 1
          |""".stripMargin, "as_of_version requires versioned")
    bad("""job: {name: j, type: spark-sql}
          |input_tables: [{name: s, source: s3, location: /t, as_of_timestamp: "1700000000000"}]
          |sql: SELECT 1
          |""".stripMargin, "as_of_timestamp requires versioned")
    bad("""job: {name: j, type: spark-sql}
          |input_tables: [{name: s, source: s3, location: /t, versioned: "true", as_of_version: "2", as_of_timestamp: "1700000000000"}]
          |sql: SELECT 1
          |""".stripMargin, "mutually exclusive")
    bad("""job: {name: j, type: spark-sql}
          |input_tables: [{name: s, source: s3, location: /t, versioned: "true", as_of_timestamp: "yesterday"}]
          |sql: SELECT 1
          |""".stripMargin, "epoch millis")
    bad("""job: {name: j, type: spark-sql}
          |input_tables: [{name: s, source: s3, location: /t, versioned: "true", schema: "a INT"}]
          |sql: SELECT 1
          |""".stripMargin, "schema from the committed files")
    bad("""job: {name: j, type: spark-sql}
          |input_tables: [{name: s, source: gdc, database: db, versioned: "true"}]
          |sql: SELECT 1
          |""".stripMargin, "s3/file sources only")
    bad("""job: {name: j, type: spark-sql}
          |input_tables: [{name: s, source: s3, location: /t, versioned: "true", incremental_source: "true"}]
          |sql: SELECT 1
          |""".stripMargin, "incremental_source with versioned")
    bad("""job: {name: j, type: spark-sql}
          |input_tables: [{name: s, source: s3, location: /t}]
          |output_table: {name: o, target: s3, location: /o, versioned: "true", partition_keys: p}
          |sql: SELECT 1
          |""".stripMargin, "cannot be combined with partition_keys")
    bad("""job: {name: j, type: spark-sql}
          |input_tables: [{name: s, source: s3, location: /t}]
          |output_table: {name: o, target: s3, location: /o, versioned: "true", manifest: "true"}
          |sql: SELECT 1
          |""".stripMargin, "per-version manifests")
    bad("""job: {name: j, type: spark-sql}
          |input_tables: [{name: s, source: s3, location: /t}]
          |output_table: {name: o, target: s3, location: /o, versioned: "true", refresh: scd2, merge_keys: k}
          |sql: SELECT 1
          |""".stripMargin, "scd2 with versioned")
    bad("""job: {name: j, type: spark-sql}
          |input_tables: [{name: s, source: s3, location: /t}]
          |output_table: {name: o, target: s3, location: /o, stats_columns: k}
          |sql: SELECT 1
          |""".stripMargin, "stats_columns requires versioned")
    bad("""job: {name: j, type: spark-sql}
          |input_tables: [{name: s, source: s3, location: /t, prune: "k <= 5"}]
          |sql: SELECT 1
          |""".stripMargin, "prune requires versioned")
    bad("""job: {name: j, type: spark-sql}
          |input_tables: [{name: s, source: s3, location: /t, versioned: "true", prune: "k != 5"}]
          |sql: SELECT 1
          |""".stripMargin, "must be <column> <op> <literal>")
    bad("""job: {name: j, type: spark-sql}
          |input_tables: [{name: s, source: s3, location: /t, versioned: "true", prune: "k = 1.5.2"}]
          |sql: SELECT 1
          |""".stripMargin, "must be an integer or a single-quoted string")
    // the happy path parses clauses at config time
    val pj = ConfigParser.parse(
      """job: {name: j, type: spark-sql}
        |input_tables:
        |  - {name: s, source: s3, location: /t, versioned: "true", prune: "k <= 20 AND seg = 'BUILDING'"}
        |sql: SELECT 1
        |""".stripMargin)
    pj.inputTables.head.source match {
      case SourceSpec.Versioned(_, _, _, _, prune, _, _) =>
        assert(prune == Seq(
          SourceSpec.PruneClause("k", "<=", Some(20L), None),
          SourceSpec.PruneClause("seg", "=", None, Some("BUILDING"))))
      case other => fail(s"expected versioned source, got $other")
    }
    // the word AND inside a quoted literal is data, not a separator
    val qj = ConfigParser.parse(
      """job: {name: j, type: spark-sql}
        |input_tables:
        |  - {name: s, source: s3, location: /t, versioned: "true", prune: "c_name = 'SMITH AND SONS' AND k > 5"}
        |sql: SELECT 1
        |""".stripMargin)
    qj.inputTables.head.source match {
      case SourceSpec.Versioned(_, _, _, _, prune, _, _) =>
        assert(prune == Seq(
          SourceSpec.PruneClause("c_name", "=", None, Some("SMITH AND SONS")),
          SourceSpec.PruneClause("k", ">", Some(5L), None)))
      case other => fail(s"expected versioned source, got $other")
    }
    bad("""job: {name: j, type: spark-sql}
          |input_tables: [{name: s, source: s3, location: /t}]
          |output_table: {name: o, target: s3, location: /o, range_partition_keys: k, coalesce: "2"}
          |sql: SELECT 1
          |""".stripMargin, "range_partition_keys cannot be combined with coalesce")
    bad("""job: {name: j, type: spark-sql}
          |input_tables: [{name: s, source: s3, location: /t}]
          |output_table: {name: o, target: gdc, database: db, versioned: "true"}
          |sql: SELECT 1
          |""".stripMargin, "versioned is supported for s3/file targets only")
  }

  test("python_file pointing at a .py is the A17 declared deviation, named at PARSE time") {
    // a real Glue migration config: the error must carry the migration
    // path (ScriptJob + script_class + script_jar), not a class-loader
    // stack trace at run time
    val e = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: python-script}
        |python_file: s3://bucket/etl/transform.py
        |""".stripMargin))
    assert(e.getMessage.contains("declared deviation"))
    assert(e.getMessage.contains("ScriptJob"))
    assert(e.getMessage.contains("script_jar"))
    // python_file holding a CLASS NAME (the documented JVM reuse of the
    // reference key) still parses
    val ok = ConfigParser.parse(
      """job: {name: j, type: python-script}
        |python_file: com.example.MyJob
        |script_jar: /path/to/user.jar
        |""".stripMargin)
    assert(ok.scriptClass.contains("com.example.MyJob"))
  }

  test("sort_by parses on file sinks; conflicts with bucket_by at PARSE time") {
    val job = ConfigParser.parse(
      """job: {name: j, type: spark-sql}
        |output_table:
        |  name: t
        |  target: s3
        |  location: /tmp/out
        |  sort_by: " d , k "
        |sql: SELECT 1
        |""".stripMargin)
    assert(job.outputTable.get.sortKeys == Seq("d", "k"))
    val e = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: spark-sql}
        |output_table:
        |  name: t
        |  target: gdc
        |  database: db
        |  sort_by: k
        |  bucket_by: k
        |  buckets: "4"
        |sql: SELECT 1
        |""".stripMargin))
    assert(e.getMessage.contains("sort_by"))
  }

  test("dq_checks parse; unknown/empty/negative and streaming fail at PARSE time") {
    val job = ConfigParser.parse(
      """job: {name: j, type: spark-sql}
        |output_table:
        |  name: t
        |  target: s3
        |  location: /tmp/out
        |  dq_checks:
        |    min_rows: "10"
        |    not_null: a, b
        |    unique: k
        |sql: SELECT 1
        |""".stripMargin)
    assert(job.outputTable.get.dqChecks.contains(
      DqChecks(Some(10L), Seq("a", "b"), Seq("k"))))
    def bad(block: String): ConfigError = intercept[ConfigError](ConfigParser.parse(
      s"""job: {name: j, type: spark-sql}
         |output_table:
         |  name: t
         |  target: s3
         |  location: /tmp/out
         |  dq_checks:
         |$block
         |sql: SELECT 1
         |""".stripMargin))
    assert(bad("    max_rows: \"5\"").getMessage.contains("max_rows"))
    assert(bad("    {}").getMessage.contains("at least one"))
    assert(bad("    min_rows: \"-1\"").getMessage.contains("non-negative"))
    val e = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: spark-sql, streaming: available_now, checkpoint_location: /tmp/c}
        |input_tables:
        |  - name: raw
        |    source: s3
        |    location: /tmp/in
        |    schema: "a INT"
        |output_table:
        |  name: t
        |  target: s3
        |  location: /tmp/out
        |  refresh: incremental
        |  dq_checks: {min_rows: "1"}
        |sql: SELECT 1
        |""".stripMargin))
    assert(e.getMessage.contains("batch-only"))
  }

  test("maintenance job parses; misconfiguration fails at PARSE time") {
    val job = ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance:
        |  location: /tmp/t
        |  files: "4"
        |""".stripMargin)
    assert(job.jobType == JobType.Maintenance)
    assert(job.maintenance.contains(
      MaintenanceSpec("compact", "/tmp/t", "parquet", Some(4))))
    // profile action parses; output is required for it
    val pj = ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: profile, location: /tmp/t, output: /tmp/stats}
        |""".stripMargin)
    assert(pj.maintenance.contains(
      MaintenanceSpec("profile", "/tmp/t", "parquet", None, Some("/tmp/stats"))))
    val ep = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: profile, location: /tmp/t}
        |""".stripMargin))
    assert(ep.getMessage.contains("output"))
    // version_vacuum needs an integer keep_from; history needs output
    val vv = ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: version_vacuum, location: /tmp/t, keep_from: "3"}
        |""".stripMargin)
    assert(vv.maintenance.exists(m =>
      m.action == "version_vacuum" && m.keepFrom.contains("3")))
    val evv = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: version_vacuum, location: /tmp/t}
        |""".stripMargin))
    assert(evv.getMessage.contains("keep_from"))
    val evv2 = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: version_vacuum, location: /tmp/t, keep_from: "latest"}
        |""".stripMargin))
    assert(evv2.getMessage.contains("version number"))
    // delete needs a row predicate; `where` is delete-only
    val dl = ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: delete, location: /tmp/t, where: "cents < 0"}
        |""".stripMargin)
    assert(dl.maintenance.exists(m =>
      m.action == "delete" && m.where.contains("cents < 0")))
    val edl = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: delete, location: /tmp/t}
        |""".stripMargin))
    assert(edl.getMessage.contains("where"))
    val edl2 = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: compact, location: /tmp/t, files: "2", where: "x > 1"}
        |""".stripMargin))
    assert(edl2.getMessage.contains("only applies to actions delete/update"))
    // update needs both where and set; set is update-only
    val up = ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: update, location: /tmp/t, where: "k = 1", set: {v: "'x'"}}
        |""".stripMargin)
    assert(up.maintenance.exists(m =>
      m.action == "update" && m.set == Map("v" -> "'x'")))
    val eup = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: update, location: /tmp/t, where: "k = 1"}
        |""".stripMargin))
    assert(eup.getMessage.contains("set"))
    val eup2 = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: delete, location: /tmp/t, where: "k = 1", set: {v: "'x'"}}
        |""".stripMargin))
    assert(eup2.getMessage.contains("only applies to action update"))
    // materialized: requires versioned output AND a versioned input
    val emv = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: spark-sql}
        |input_tables: [{name: a, source: s3, location: /tmp/a}]
        |output_table: {name: o, target: s3, location: /tmp/o, versioned: true, materialized: true}
        |sql: SELECT 1
        |""".stripMargin))
    assert(emv.getMessage.contains("versioned: true"))
    val emv2 = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: spark-sql}
        |input_tables: [{name: a, source: s3, location: /tmp/a, versioned: "true"}]
        |output_table: {name: o, target: s3, location: /tmp/o, materialized: true}
        |sql: SELECT 1
        |""".stripMargin))
    assert(emv2.getMessage.contains("materialized requires versioned"))
    // branch surface: maintenance branch actions need branch:, output
    // branch needs versioned, input branch excludes as_of
    val ebr = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: publish_branch, location: /tmp/t}
        |""".stripMargin))
    assert(ebr.getMessage.contains("branch"))
    val ebr2 = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: spark-sql}
        |output_table: {name: o, target: s3, location: /tmp/o, branch: audit}
        |sql: SELECT 1
        |""".stripMargin))
    assert(ebr2.getMessage.contains("branch requires versioned"))
    val ebr3 = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: spark-sql}
        |input_tables:
        |  - {name: a, source: s3, location: /tmp/a, versioned: "true", branch: audit, as_of_version: "2"}
        |sql: SELECT 1
        |""".stripMargin))
    assert(ebr3.getMessage.contains("branch reads the branch HEAD"))
    // compact_deletes: fraction validated; fraction is action-scoped
    val ecd = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: compact_deletes, location: /tmp/t, min_deleted_fraction: "1.5"}
        |""".stripMargin))
    assert(ecd.getMessage.contains("(0,1]"))
    val ecd2 = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: vacuum, location: /tmp/t, min_deleted_fraction: "0.5"}
        |""".stripMargin))
    assert(ecd2.getMessage.contains("only applies to compact_deletes"))
    // mask: rules validated by name at parse time
    val emk = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: spark-sql}
        |output_table: {name: o, target: s3, location: /tmp/o, mask: {c: rot13}}
        |sql: SELECT 1
        |""".stripMargin))
    assert(emk.getMessage.contains("hash|null|last4"))
    val mk = ConfigParser.parse(
      """job: {name: j, type: spark-sql}
        |output_table: {name: o, target: s3, location: /tmp/o, mask: {a: hash, b: "null"}}
        |sql: SELECT 1
        |""".stripMargin)
    assert(mk.outputTable.get.mask == Map("a" -> "hash", "b" -> "null"))
    // version_vacuum keep_last: positive, exclusive with keep_from
    val kl = ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: version_vacuum, location: /tmp/t, keep_last: "3"}
        |""".stripMargin)
    assert(kl.maintenance.exists(_.keepLast.contains(3L)))
    val ekl = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: version_vacuum, location: /tmp/t, keep_from: "2", keep_last: "3"}
        |""".stripMargin))
    assert(ekl.getMessage.contains("mutually exclusive"))
    val ekl2 = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: version_vacuum, location: /tmp/t, keep_last: "0"}
        |""".stripMargin))
    assert(ekl2.getMessage.contains("positive"))
    val eh = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: history, location: /tmp/t}
        |""".stripMargin))
    assert(eh.getMessage.contains("output"))
    // type maintenance without the block
    val e1 = intercept[ConfigError](ConfigParser.parse(
      "job: {name: j, type: maintenance}\n"))
    assert(e1.getMessage.contains("maintenance"))
    // block without the type
    val e2 = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: spark-sql}
        |maintenance: {location: /tmp/t, files: "2"}
        |sql: SELECT 1
        |""".stripMargin))
    assert(e2.getMessage.contains("job.type maintenance"))
    // unknown action / missing location / non-positive files
    val e3 = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: zap, location: /tmp/t, files: "2"}
        |""".stripMargin))
    assert(e3.getMessage.contains("zap"))
    val e4 = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {files: "2"}
        |""".stripMargin))
    assert(e4.getMessage.contains("location"))
    val e5 = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {location: /tmp/t, files: "0"}
        |""".stripMargin))
    assert(e5.getMessage.contains("positive"))
    // retain parses with its two required keys; each is enforced
    val rj = ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: retain, location: /tmp/t, partition_col: d, keep_from: "2025-01-01"}
        |""".stripMargin)
    assert(rj.maintenance.contains(MaintenanceSpec("retain", "/tmp/t", "parquet",
      None, None, Some("d"), Some("2025-01-01"))))
    val e6 = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: retain, location: /tmp/t, keep_from: "x"}
        |""".stripMargin))
    assert(e6.getMessage.contains("partition_col"))
    // vacuum needs only the location
    val vj = ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: vacuum, location: /tmp/db}
        |""".stripMargin)
    assert(vj.maintenance.exists(m => m.action == "vacuum" && m.location == "/tmp/db"))
    val e7 = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: retain, location: /tmp/t, partition_col: d}
        |""".stripMargin))
    assert(e7.getMessage.contains("keep_from"))
    // cluster parses its csv key list; >= 2 columns and files enforced;
    // cluster_by is rejected on any other action
    val cj = ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: cluster, location: /tmp/t, cluster_by: "a, b", files: "4"}
        |""".stripMargin)
    assert(cj.maintenance.exists(m =>
      m.action == "cluster" && m.clusterBy == Seq("a", "b") && m.files.contains(4)))
    val e8 = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: cluster, location: /tmp/t, cluster_by: "a", files: "4"}
        |""".stripMargin))
    assert(e8.getMessage.contains(">= 2"))
    val e9 = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: cluster, location: /tmp/t, cluster_by: "a, b"}
        |""".stripMargin))
    assert(e9.getMessage.contains("files"))
    val e10 = intercept[ConfigError](ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: vacuum, location: /tmp/t, cluster_by: "a, b"}
        |""".stripMargin))
    assert(e10.getMessage.contains("only applies to action cluster"))
  }

  test("manifest: parses as a file-target boolean, rejected elsewhere") {
    def yaml(outBlock: String) =
      s"""job: {name: j, type: spark-sql}
         |input_tables:
         |  - {name: t, source: s3, location: /tmp/in}
         |output_table:
         |$outBlock
         |sql: SELECT 1
         |""".stripMargin
    val ok = ConfigParser.parse(yaml(
      "  {name: o, target: s3, location: /tmp/out, manifest: \"true\"}"))
    assert(ok.outputTable.exists(_.manifest))
    val off = ConfigParser.parse(yaml(
      "  {name: o, target: s3, location: /tmp/out}"))
    assert(off.outputTable.exists(!_.manifest))
    val e1 = intercept[ConfigError](ConfigParser.parse(yaml(
      "  {name: o, target: s3, location: /tmp/out, manifest: maybe}")))
    assert(e1.getMessage.contains("manifest must be true/false"))
    val e2 = intercept[ConfigError](ConfigParser.parse(yaml(
      "  {name: o, target: gdc, database: db, manifest: \"true\"}")))
    assert(e2.getMessage.contains("file targets only"))
  }

  test("observe_cols: parses the column list, rejected off file targets") {
    def yaml(outBlock: String) =
      s"""job: {name: j, type: spark-sql}
         |input_tables:
         |  - {name: t, source: s3, location: /tmp/in}
         |output_table:
         |$outBlock
         |sql: SELECT 1
         |""".stripMargin
    val ok = ConfigParser.parse(yaml(
      "  {name: o, target: s3, location: /tmp/out, observe_cols: \"a, b\"}"))
    assert(ok.outputTable.exists(_.observeCols == Seq("a", "b")))
    val e = intercept[ConfigError](ConfigParser.parse(yaml(
      "  {name: o, target: gdc, database: db, observe_cols: a}")))
    assert(e.getMessage.contains("file targets only"))
  }

  test("restore: to_version required, numeric, restore-only") {
    def yaml(m: String) =
      s"""job: {name: j, type: maintenance}
         |maintenance: $m
         |""".stripMargin
    assert(ConfigParser.parse(yaml(
      """{action: restore, location: /tmp/t, to_version: "2"}"""))
      .maintenance.exists(m => m.action == "restore" && m.toVersion.contains("2")))
    val e1 = intercept[ConfigError](ConfigParser.parse(yaml(
      "{action: restore, location: /tmp/t}")))
    assert(e1.getMessage.contains("to_version"))
    val e2 = intercept[ConfigError](ConfigParser.parse(yaml(
      """{action: restore, location: /tmp/t, to_version: "latest"}""")))
    assert(e2.getMessage.contains("version number"))
    val e3 = intercept[ConfigError](ConfigParser.parse(yaml(
      """{action: vacuum, location: /tmp/t, to_version: "2"}""")))
    assert(e3.getMessage.contains("only applies to restore"))
    // {var} resolves at run time
    assert(ConfigParser.parse(yaml(
      """{action: restore, location: /tmp/t, to_version: "{v}"}"""))
      .maintenance.exists(_.toVersion.contains("{v}")))
  }

  test("create_branch: keep_from (the fork version) must parse as a version number") {
    def yaml(kf: String) =
      s"""job: {name: j, type: maintenance}
         |maintenance: {action: create_branch, location: /tmp/t, branch: b, keep_from: "$kf"}
         |""".stripMargin
    // numeric fork version parses
    assert(ConfigParser.parse(yaml("3")).maintenance
      .exists(m => m.action == "create_branch" && m.keepFrom.contains("3")))
    // a typo is a PARSE-time ConfigError, not a NumberFormatException mid-run
    val e = intercept[ConfigError](ConfigParser.parse(yaml("latest")))
    assert(e.getMessage.contains("version number"))
    // {var} interpolations resolve at run time and are exempt
    assert(ConfigParser.parse(yaml("{fork_v}")).maintenance
      .exists(_.keepFrom.contains("{fork_v}")))
    // keep_from stays optional (fork at head)
    assert(ConfigParser.parse(
      """job: {name: j, type: maintenance}
        |maintenance: {action: create_branch, location: /tmp/t, branch: b}
        |""".stripMargin).maintenance.exists(_.keepFrom.isEmpty))
  }
}
