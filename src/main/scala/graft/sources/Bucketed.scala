package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: persist a frame as a parquet table hash-
  * bucketed (and sorted) on a key, so every LATER join or aggregation on
  * that key reads co-located buckets with NO Exchange — the shuffle is
  * paid once at write time instead of once per query. This is the
  * standard layout for a 100 TB fact table that is joined on the same
  * key by many downstream queries; `repartition()` only fixes one plan,
  * bucketing fixes the storage. (BucketingSpec proves the join plan of
  * two co-bucketed tables contains zero shuffle exchanges.)
  */
object Bucketed {

  /** (Re)write `df` as `db`.`name`, bucketed+sorted on `key`. Idempotent
    * per JVM run: the in-memory catalog is per-JVM but warehouse dirs
    * persist, so both the catalog entry and the stale directory are
    * cleared before writing (same pitfall as the fw_catalog gate). */
  def ensureTable(s: SparkSession, db: String, name: String, df: DataFrame,
                  key: String, buckets: Int): String = {
    s.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    s.sql(s"DROP TABLE IF EXISTS $db.$name")
    val dir = new org.apache.hadoop.fs.Path(
      s"${s.conf.get("spark.sql.warehouse.dir")}/$db.db/$name")
    val fs = dir.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.delete(dir, true)
    df.write.format("parquet").bucketBy(buckets, key).sortBy(key)
      .saveAsTable(s"$db.$name")
    s"$db.$name"
  }
}
