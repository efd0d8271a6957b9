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
  // directly on the core library.
  private val knownFormats = Set("parquet", "csv", "json", "orc", "text", "avro")

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
      reader.load(location)

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
    * explicit `schema:`). Two passes, both scan-shaped and shuffle-free:
    *
    *   1. good side — the normal reader in `DROPMALFORMED` mode (the
    *      registered view: only rows that parse against the schema);
    *   2. bad side — the input re-read as raw TEXT lines, re-parsed with
    *      `from_csv`/`from_json` + PERMISSIVE corrupt-record capture;
    *      lines that fail land in the quarantine path as
    *      (raw_record, src_file) parquet, appended per run.
    *
    * Why two scans instead of one PERMISSIVE read split by the corrupt
    * column: Spark (correctly) refuses to filter on the corrupt column
    * alone without caching the parsed dataset — and caching the INPUT
    * is exactly what a 100 TB scan cannot do. Two narrow scans keep
    * both sides pipelined at scan speed with no corpus-sized state. */
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

    // bad side first (so a crash between the two scans leaves evidence,
    // not silence): raw lines whose re-parse trips the corrupt column
    val parseSchema = structType.add("__corrupt", org.apache.spark.sql.types.StringType)
    val parseOpts = opts + ("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "__corrupt")
    val raw = spark.read
      .option("recursiveFileLookup", options.getOrElse("recursiveFileLookup", "true"))
      .text(location)
    val parsed = format match {
      case "csv" => from_csv(col("value"), parseSchema, parseOpts)
      case "json" => from_json(col("value"), parseSchema, parseOpts)
      case other => throw new ConfigError(
        s"quarantine is only supported for csv/json sources, got '$other'")
    }
    raw.select(col("value").as("raw_record"),
        input_file_name().as("src_file"),
        parsed.getField("__corrupt").as("__c"))
      .filter(col("__c").isNotNull)
      .drop("__c")
      .write.mode("append").parquet(quarantinePath)

    spark.read.format(format)
      .options(opts)
      .option("mode", "DROPMALFORMED")
      .option("recursiveFileLookup", options.getOrElse("recursiveFileLookup", "true"))
      .schema(structType)
      .load(location)
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
