package graft.script

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reference A17 demo payload: the script-job escape hatch running an
  * arbitrary DataFrame program with full session access — here a filter +
  * projection from a var-supplied input to a var-supplied output, plus a
  * UDF registration to prove the hatch covers B34 (the reference's
  * `exec()`ed scripts register UDFs the same way,
  * `glue/glue_etl_framework.py:305`). */
class ExampleScriptJob extends ScriptJob {
  override def run(spark: SparkSession, vars: Map[String, String]): Unit = {
    val in = vars.getOrElse("in", sys.error("ExampleScriptJob needs var 'in'"))
    val out = vars.getOrElse("out", sys.error("ExampleScriptJob needs var 'out'"))
    spark.udf.register("fw_double", (x: Long) => x * 2)
    spark.read.parquet(in)
      .filter(col("n_regionkey") === 2)
      .selectExpr("n_nationkey", "n_name", "fw_double(n_nationkey) AS doubled")
      .write.mode("overwrite").parquet(out)
  }
}
