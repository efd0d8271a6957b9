package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared fixture readers for the query suites.
  *
  * `events.parquet` is written with TIMESTAMP(NANOS) which Spark 4's
  * parquet reader rejects outright ([PARQUET_TYPE_ILLEGAL]). We read it
  * with `spark.sql.legacy.parquet.nanosAsLong` (ts arrives as LongType
  * nanos) and rebuild a TimestampType column. The fixture's timestamps
  * are exactly µs-precision (verified: 0 rows with sub-µs bits), so
  * nanos→micros is lossless and Spark/DuckDB see identical instants.
  */
object Tables {

  def apply(s: SparkSession, dir: String, n: String): DataFrame =
    if (n == "events") events(s, dir) else s.read.parquet(s"$dir/$n.parquet")

  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/events.parquet")
      // integer `div`, not `/`: a double mantissa can't hold ns-epoch values
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
