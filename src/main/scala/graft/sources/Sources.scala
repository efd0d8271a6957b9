package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.config.{ConfigError, SourceSpec}

/** `InputTable => DataFrame` — reference A1/A2/A3
  * (`glue/glue_etl_framework.py:63-133`), SURVEY.md §7 module 2.
  *
  * Scale notes: the file scan is a plain `DataFrameReader` so Catalyst's
  * vectorized parquet/orc readers, predicate pushdown, column pruning and
  * partition pruning all apply; `recursiveFileLookup` mirrors Glue's
  * recursive S3 listing. At 100 TB the scan parallelism comes from
  * `spark.sql.files.maxPartitionBytes` — we deliberately do not repartition
  * after read (that would shuffle the full input).
  */
object Sources {

  /** Glue `format_options` → Spark reader options
    * (`README.md:44,121-126`): Glue names on the left, Spark on the right.
    * Unknown keys pass through untouched so native Spark options also work. */
  private val glueOptionNames: Map[String, String] = Map(
    "withHeader" -> "header",
    "separator"  -> "sep",
    "quoteChar"  -> "quote",
    "escaper"    -> "escape",
    "multiline"  -> "multiLine",
    "compression" -> "compression",
    "writeHeader" -> "header")

  private[graft] def mapOptions(opts: Map[String, String]): Map[String, String] =
    opts.collect { case (k, v) if k != "optimizePerformance" =>
      glueOptionNames.getOrElse(k, k) -> v }

  // `avro` resolves to graft's own [[GraftAvroFileFormat]] (registered via
  // DataSourceRegister): /opt/spark/jars ships avro-core but not the
  // spark-avro datasource module, so the container format is implemented
  // directly on the core library. `xml` is Spark 4's built-in XML source
  // (spark-xml merged upstream) — `rowTag` etc. pass through
  // format_options untouched.
  private val knownFormats = Set("parquet", "csv", "json", "orc", "text", "avro", "xml")

  def load(spark: SparkSession, spec: SourceSpec): DataFrame = spec match {
    case SourceSpec.File(location, format, options, schema) =>
      if (!knownFormats(format))
        throw new ConfigError(s"unsupported input format '$format' (supported: ${knownFormats.mkString(", ")})")
      val reader = spark.read
        .format(format)
        .options(mapOptions(options))
        .option("recursiveFileLookup",
          options.getOrElse("recursiveFileLookup", "true"))
      // explicit DDL schema: names headerless columns and skips the
      // inference pre-scan (a full extra read of the input at scale)
      schema.foreach(ddl => reader.schema(
        try org.apache.spark.sql.types.StructType.fromDDL(ddl)
        catch { case e: Exception =>
          throw new ConfigError(s"invalid schema DDL '$ddl': ${e.getMessage}") }))
      // pointer-layout tables (plain sinks published on overwrite-only
      // deployments via the generation-pointer protocol) resolve to
      // their current generation; everything else reads the location
      // as-is (one fs.exists probe, driver-side). The retry wrapper
      // covers the LOAD-TIME straggle (the generation purged between
      // resolve and the load's listing — re-resolve once). A straggle
      // during a LATER action on the returned lazy frame fails at that
      // action (no wrapper installed here can catch it) — the grace
      // window (keepGenerations) is the first line for those, and the
      // caller re-reads through withPointerRetry on the loud failure.
      graft.sinks.Sinks.withPointerRetry(spark, location)(p => reader.load(p))

    case SourceSpec.Versioned(location, format, options, asOf0, prune, asOfTs, Some(branch)) =>
      // branch HEAD read — the WAP audit scan (parse guarantees no
      // as_of/prune combination)
      graft.sinks.VersionedTable.readBranch(spark, location, branch,
        None, format, mapOptions(options))

    case SourceSpec.Versioned(location, format, options, asOf0, prune, asOfTs, None) =>
      // snapshot read of a versioned-manifest table: the plan loads
      // EXACTLY the resolved manifest's file list (time travel via
      // as_of_version, or as_of_timestamp resolved against the commit
      // wall clocks), never a directory listing. `prune:` plans from
      // the zone maps (files that cannot match are never opened), then
      // re-applies the clauses as an ordinary filter on the kept files
      // so the view is exactly the predicate's rows.
      val asOf = asOfTs
        .map(ts => graft.sinks.VersionedTable.versionAt(spark, location, ts))
        .orElse(asOf0)
      if (prune.isEmpty)
        graft.sinks.VersionedTable.read(spark, location, asOf, format,
          mapOptions(options))
      else {
        import org.apache.spark.sql.functions.{col, lit}
        val scan = graft.sinks.VersionedTable.readPruned(spark, location,
          prune.map(p => graft.sinks.VersionedTable.Prune(p.column, p.op, p.value)),
          asOf, format, mapOptions(options))
        prune.foldLeft(scan.df) { (df, p) =>
          val c = col(p.column); val v = lit(p.value)
          df.filter(p.op match {
            case "=" => c === v
            case "<" => c < v
            case "<=" => c <= v
            case ">" => c > v
            case ">=" => c >= v
          })
        }
      }

    case SourceSpec.Catalog(database, table) =>
      // A2: catalog scan via the session catalog / metastore
      // (`glue_etl_framework.py:112-116`).
      spark.table(s"$database.$table")

    case SourceSpec.Jdbc(url, database, table, options) =>
      // A3 implemented for real (the reference stub crashes,
      // `glue_etl_framework.py:119-120,128`). `dbtable` supports a
      // subquery alias; partitioned reads via the standard
      // partitionColumn/lowerBound/upperBound/numPartitions options.
      val qualified = if (database.nonEmpty) s"$database.$table" else table
      spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", options.getOrElse("dbtable", qualified))
        .options(options - "dbtable")
        .load()
  }

  /** File scan with MALFORMED-ROW quarantine (beyond-reference; the
    * config surface is `quarantine: <path>` on a csv/json input with an
    * explicit `schema:`). Both sides derive from raw TEXT line scans
    * re-parsed with `from_csv`/`from_json` + PERMISSIVE corrupt-record
    * capture — shuffle-free, and the SAME parse expression defines
    * malformed-ness for both, so the split is exact by construction:
    *
    *   1. bad side (written first, so a crash between the passes leaves
    *      evidence, not silence) — lines that trip the corrupt column
    *      land in the quarantine path as (raw_record, src_file)
    *      parquet, OVERWRITTEN per run (a re-run over the same input
    *      reproduces the same rejects — idempotent, the engine's
    *      re-run discipline — rather than appending duplicates);
    *   2. good side — the registered view: lines whose full-schema
    *      parse is clean, expanded to the declared columns.
    *
    * Why not the obvious reader shapes: a `DROPMALFORMED` reader view
    * defines malformed-ness relative to the columns each query NEEDS —
    * under column pruning, `SELECT count(*)` parses nothing and counts
    * every bad row (measured: 4/4 instead of 2/4 on a planted file) —
    * and a PERMISSIVE reader filtered on its corrupt column is
    * disallowed without caching the parsed input (impossible at scale).
    * The `from_csv`/`from_json` EXPRESSION is immune to both: the
    * csv/json expression optimizer never prunes a parse schema carrying
    * options, so the full-row parse verdict survives any downstream
    * projection. Caveat, enforced at config parse: headerless, line-
    * delimited input only (the text re-scan is line-based). */
  def loadWithQuarantine(spark: SparkSession, spec: SourceSpec.File,
                         quarantinePath: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val SourceSpec.File(location, format, options, schemaDdl) = spec
    val ddl = schemaDdl.getOrElse(throw new ConfigError(
      s"quarantine source '$location' needs an explicit schema"))
    val structType =
      try org.apache.spark.sql.types.StructType.fromDDL(ddl)
      catch { case e: Exception =>
        throw new ConfigError(s"invalid schema DDL '$ddl': ${e.getMessage}") }
    val opts = mapOptions(options)
    val parseSchema = structType.add("__corrupt", org.apache.spark.sql.types.StringType)
    val parseOpts = opts + ("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "__corrupt")
    def raw = spark.read
      .option("recursiveFileLookup", options.getOrElse("recursiveFileLookup", "true"))
      .text(location)
    def parsed(c: org.apache.spark.sql.Column) = format match {
      case "csv" => from_csv(c, parseSchema, parseOpts)
      case "json" => from_json(c, parseSchema, parseOpts)
      case other => throw new ConfigError(
        s"quarantine is only supported for csv/json sources, got '$other'")
    }

    raw.select(col("value").as("raw_record"),
        input_file_name().as("src_file"),
        parsed(col("value")).getField("__corrupt").as("__c"))
      .filter(col("__c").isNotNull)
      .drop("__c")
      .write.mode("overwrite").parquet(quarantinePath)

    raw.select(parsed(col("value")).as("__r"))
      .filter(col("__r.__corrupt").isNull)
      .select(structType.fieldNames.map(n => col("__r").getField(n).as(n)).toSeq: _*)
  }

  /** Streaming flavor of the file scan: same format/option mapping, but
    * through `readStream` so the engine's declared pipeline drains new
    * files incrementally under a checkpoint. The schema is REQUIRED (the
    * parser enforces it): an unbounded source has no bounded inference
    * pre-scan. Catalog/JDBC sources have no streaming analog here. */
  def loadStream(spark: SparkSession, spec: SourceSpec.File): DataFrame = {
    val SourceSpec.File(location, format, options, schema) = spec
    if (!knownFormats(format))
      throw new ConfigError(s"unsupported input format '$format' (supported: ${knownFormats.mkString(", ")})")
    val ddl = schema.getOrElse(throw new ConfigError(
      s"streaming file source '$location' needs an explicit schema"))
    spark.readStream
      .format(format)
      .options(mapOptions(options))
      .schema(
        try org.apache.spark.sql.types.StructType.fromDDL(ddl)
        catch { case e: Exception =>
          throw new ConfigError(s"invalid schema DDL '$ddl': ${e.getMessage}") })
      .load(location)
  }
}
