package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Scale-safe global row numbering (SURVEY §2B B18).
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY forces every
  * row through ONE task — a guaranteed straggler/OOM at scale (Spark
  * itself warns "No Partition Defined for Window operation"). The
  * distributed equivalent, same total order:
  *
  *   1. range-partitioned global sort (`orderBy` → RangePartitioning) —
  *      the one unavoidable full shuffle;
  *   2. `localCheckpoint` so the sorted result is materialized once;
  *   3. `zipWithIndex` — a NARROW op: one tiny job reads per-partition
  *      counts off the checkpoint, then each partition numbers its own
  *      rows with its prefix offset. No second full-data exchange (the
  *      earlier window-on-partition-id form re-shuffled everything by
  *      `spark_partition_id`, doubling data movement at scale).
  *
  * Requires the sort key to be total (add a unique tiebreaker) for a
  * deterministic numbering.
  */
object GlobalSort {

  def withRowNumber(df: DataFrame, name: String, sortCols: Column*): DataFrame = {
    val sorted = df.orderBy(sortCols: _*).localCheckpoint(true)
    val schema = sorted.schema.add(name, LongType, nullable = false)
    val numbered = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    sorted.sparkSession.createDataFrame(numbered, schema)
  }
}
