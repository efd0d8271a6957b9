package graft.script

import org.apache.spark.sql.SparkSession
import graft.config.{ConfigError, JobSpec}

/** Script-job escape hatch — reference A17 downloads a Python file and
  * `exec()`s it with full session access (`glue/glue_etl_framework.py:
  * 279-309`). The JVM-native analog: a user class implementing this trait,
  * loaded by reflection from the job's `script_class` config key. Same
  * capability (arbitrary DataFrame programs, UDF registration), without
  * arbitrary-code-from-a-bucket. */
trait ScriptJob {
  def run(spark: SparkSession, vars: Map[String, String]): Unit
}

object ScriptRunner {
  def run(spark: SparkSession, job: JobSpec, vars: Map[String, String]): Unit = {
    val cls = job.scriptClass.getOrElse(
      throw new ConfigError("script job needs `script_class` (fully-qualified class implementing graft.script.ScriptJob)"))
    val instance =
      try Class.forName(cls).getDeclaredConstructor().newInstance()
      catch { case e: ClassNotFoundException =>
        throw new ConfigError(s"script_class '$cls' not found: ${e.getMessage}") }
    instance match {
      case s: ScriptJob => s.run(spark, vars)
      case other => throw new ConfigError(
        s"script_class '$cls' (${other.getClass}) does not implement graft.script.ScriptJob")
    }
  }
}
