package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Shared fixture readers for the query suites.
  *
  * `events.parquet` has shipped in two layouts across driver rounds:
  * TIMESTAMP(NANOS) (Spark 4's parquet reader rejects it outright with
  * [PARQUET_TYPE_ILLEGAL] unless `spark.sql.legacy.parquet.nanosAsLong`
  * makes `ts` arrive as LongType nanos) and plain timestamp[us]. The
  * reader adapts to what the footer actually says instead of assuming a
  * layout. Either way the timestamps are µs-precision instants and
  * Spark/DuckDB see identical values (UTC session; the builders also set
  * `spark.sql.parquet.inferTimestampNTZ.enabled=false` so naive µs
  * columns load as TimestampType directly, keeping scan-level pushdown).
  */
object Tables {

  def apply(s: SparkSession, dir: String, n: String): DataFrame =
    if (n == "events") events(s, dir) else s.read.parquet(s"$dir/$n.parquet")

  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      // TIMESTAMP(NANOS) layout under nanosAsLong: rebuild with integer
      // `div`, not `/` — a double mantissa can't hold ns-epoch values
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // naive µs layout when NTZ inference is on: same instant under the
      // UTC session zone
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
}
