package example.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fixture payload for the `script_jar` runtime-load path (A17): this class
  * is compiled OUT of the engine's build (see ../build.sh) into
  * external-script-job.jar and is loadable only through the jar — proving a
  * user can ship a custom job without rebuilding the engine, the reference's
  * exec()-a-downloaded-script capability. The registered UDF runs inside
  * tasks, so it also proves executor-side class distribution (addJar). */
class ExternalScoreJob extends graft.script.ScriptJob {
  override def run(spark: SparkSession, vars: Map[String, String]): Unit = {
    val in = vars.getOrElse("in", sys.error("ExternalScoreJob needs var 'in'"))
    val out = vars.getOrElse("out", sys.error("ExternalScoreJob needs var 'out'"))
    spark.udf.register("ext_score", (name: String) => name.length.toLong * 3 + 1)
    spark.read.parquet(in)
      .filter(col("n_regionkey") < 3)
      .selectExpr("n_nationkey", "n_name", "ext_score(n_name) AS score")
      .write.mode("overwrite").parquet(out)
  }
}
