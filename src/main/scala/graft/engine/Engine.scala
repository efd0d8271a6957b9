package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.config._
import graft.sources.Sources
import graft.sinks.Sinks

/** Orchestration core — the reference's whole query lifecycle
  * (`glue/glue_etl_framework.py:136-275`, SURVEY.md §3) re-expressed as
  * pure driver-side Spark: load inputs → register temp views → run the
  * single SELECT → shape → write. One lazy plan, one action; Catalyst owns
  * optimization and physical execution end to end (SURVEY §4: the
  * reference has no optimizer of its own either — parity needs zero
  * custom rules).
  */
object Engine {

  /** A4: every input registered as a temp view under its config name
    * (`glue_etl_framework.py:57-61`). Locations/options are interpolated
    * with the pipeline variables first (A20). */
  def registerInputs(spark: SparkSession, job: JobSpec,
                     vars: Map[String, String]): Map[String, DataFrame] =
    job.inputTables.map { t =>
      val resolved = t.source match {
        case SourceSpec.File(loc, fmt, opts) =>
          SourceSpec.File(Interpolate(loc, vars), fmt,
            opts.map { case (k, v) => k -> Interpolate(v, vars) })
        case SourceSpec.Catalog(db, tbl) =>
          SourceSpec.Catalog(Interpolate(db, vars), Interpolate(tbl, vars))
        case SourceSpec.Jdbc(url, db, tbl, opts) =>
          SourceSpec.Jdbc(Interpolate(url, vars), Interpolate(db, vars),
            Interpolate(tbl, vars), opts.map { case (k, v) => k -> Interpolate(v, vars) })
      }
      val df = Sources.load(spark, resolved)
      df.createOrReplaceTempView(t.name)
      t.name -> df
    }.toMap

  /** A5+A6: resolve the SQL text (inline beats file when both are given,
    * `README.md:59-60`), interpolate `{vars}`, dispatch to Catalyst.
    * Deliberately no whitespace-collapse / quote-swap (Appendix Q1/Q2). */
  def resolveSql(spark: SparkSession, job: JobSpec, vars: Map[String, String]): String = {
    val raw = job.sql.orElse(job.sqlFile.map(f => readTextFile(spark, Interpolate(f, vars))))
      .getOrElse(throw new ConfigError("spark-sql job needs `sql` or `sql_file`"))
    Interpolate(raw, vars)
  }

  /** A7: SQL-from-file via Hadoop FS — works for file://, hdfs://, s3a://
    * alike (the reference is boto3/S3-only, `glue_etl_framework.py:141-163`). */
  def readTextFile(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  /** Full spark-sql job for one pipeline: the reference's
    * `run_spark_sql_job` (`glue_etl_framework.py:136-275`). Returns the
    * result frame (pre-sink) for inspection/testing. */
  def runSparkSqlJob(spark: SparkSession, job: JobSpec, pipeline: String): DataFrame = {
    val vars = job.varsFor(pipeline) + ("pipeline_name" -> pipeline)
    registerInputs(spark, job, vars)
    val result = spark.sql(resolveSql(spark, job, vars))
    job.outputTable.foreach { out0 =>
      val out = out0.copy(
        name = Interpolate(out0.name, vars),
        target = out0.target match {
          case TargetSpec.File(loc) => TargetSpec.File(Interpolate(loc, vars))
          case c => c
        })
      Sinks.write(spark, result, out)
    }
    result
  }

  /** Top-level dispatch on job.type (`glue_etl_framework.py:417-431`). */
  def run(spark: SparkSession, job: JobSpec, pipeline: String): Option[DataFrame] =
    job.jobType match {
      case JobType.SparkSql => Some(runSparkSqlJob(spark, job, pipeline))
      case JobType.Script =>
        graft.script.ScriptRunner.run(spark, job, job.varsFor(pipeline)); None
    }

  /** A18: apply job.spark_config before use (builder passthrough). */
  def applySparkConfig(builder: SparkSession.Builder, job: JobSpec): SparkSession.Builder =
    job.sparkConfig.foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
}

/** CLI entry mirroring the reference's `__main__` argument contract
  * (`glue_etl_framework.py:363-366`): --config <path> --pipeline <name>
  * [--var k=v ...] with config read through Hadoop FS. */
object EtlMain {
  def main(args: Array[String]): Unit = {
    val a = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val configPath = a.getOrElse("--config", sys.error("--config <path> required"))
    val pipeline = a.getOrElse("--pipeline", "default")
    val spark0 = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
    // bootstrap a minimal session just to read the config text
    val boot = spark0.getOrCreate()
    val job = ConfigParser.parse(Engine.readTextFile(boot, configPath))
    val spark = Engine.applySparkConfig(spark0, job).getOrCreate()
    try Engine.run(spark, job, pipeline) finally spark.stop()
  }
}
