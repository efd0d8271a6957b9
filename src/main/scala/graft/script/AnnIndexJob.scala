package graft.script

import org.apache.spark.sql.SparkSession

/** YAML-driven ANN index BUILD (the A17 script-job surface carrying a
  * real maintenance workload, not a demo): reads an embeddings table,
  * fits graft's exact integer k-means
  * ([[graft.operators.Clustering.kmeansCentroids]]), and stores the
  * centroid table — train once as an ETL job, probe many times with
  * [[graft.operators.Similarity.ivfTopKIndexed]]. Vars: `in` (parquet
  * path), `out` (index path), optional `id`/`vec` column names,
  * `k`, `iters`. */
class AnnIndexJob extends ScriptJob {
  override def run(spark: SparkSession, vars: Map[String, String]): Unit = {
    val in = vars.getOrElse("in", sys.error("AnnIndexJob needs var 'in'"))
    val out = vars.getOrElse("out", sys.error("AnnIndexJob needs var 'out'"))
    graft.operators.Clustering.kmeansCentroids(
      spark.read.parquet(in),
      vars.getOrElse("id", "vec_id"), vars.getOrElse("vec", "embedding"),
      k = vars.getOrElse("k", "8").toInt,
      iters = vars.getOrElse("iters", "3").toInt)
      .write.mode("overwrite").parquet(out)
  }
}
