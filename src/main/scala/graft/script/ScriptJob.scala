package graft.script

import org.apache.spark.sql.SparkSession
import graft.config.{ConfigError, Interpolate, JobSpec}

/** Script-job escape hatch — reference A17 downloads a Python file and
  * `exec()`s it with full session access (`glue/glue_etl_framework.py:
  * 279-309`). The JVM-native analog: a user class implementing this trait,
  * loaded by reflection from the job's `script_class` config key — either
  * from the engine's own classpath, or (the reference's actual capability:
  * shipping a job WITHOUT rebuilding the engine) from an external jar named
  * by `script_jar`. */
trait ScriptJob {
  def run(spark: SparkSession, vars: Map[String, String]): Unit
}

object ScriptRunner {
  def run(spark: SparkSession, job: JobSpec, vars: Map[String, String]): Unit = {
    val cls = job.scriptClass.getOrElse(
      throw new ConfigError("script job needs `script_class` (fully-qualified class implementing graft.script.ScriptJob)"))
    // `script_jar` = the runtime-loadable path (reference parity: the
    // user's job code lives outside the engine build, like the exec()ed
    // script from S3). The jar is ALSO registered with the SparkContext so
    // executors on a real cluster can deserialize the job's closures/UDFs
    // — URLClassLoader alone would only cover the driver.
    val loader = job.scriptJar match {
      case Some(raw) =>
        val path = Interpolate(raw, vars)
        val f = new java.io.File(path)
        if (!f.isFile) throw new ConfigError(s"script_jar '$path' not found")
        spark.sparkContext.addJar(f.getAbsolutePath)
        new java.net.URLClassLoader(Array(f.toURI.toURL), getClass.getClassLoader)
      case None => getClass.getClassLoader
    }
    val instance =
      try Class.forName(cls, true, loader).getDeclaredConstructor().newInstance()
      catch { case e: ClassNotFoundException =>
        throw new ConfigError(s"script_class '$cls' not found: ${e.getMessage}") }
    instance match {
      case s: ScriptJob =>
        // task deserialization resolves classes through the context
        // classloader — point it at the jar's loader for the duration
        val t = Thread.currentThread()
        val saved = t.getContextClassLoader
        t.setContextClassLoader(loader)
        try s.run(spark, vars) finally t.setContextClassLoader(saved)
      case other => throw new ConfigError(
        s"script_class '$cls' (${other.getClass}) does not implement graft.script.ScriptJob")
    }
  }
}
