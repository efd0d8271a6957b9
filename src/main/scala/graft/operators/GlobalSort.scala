package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scale-safe global row numbering (SURVEY §2B B18).
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY forces every
  * row through ONE task — a guaranteed straggler/OOM at scale (Spark
  * itself warns "No Partition Defined for Window operation"). The
  * distributed equivalent, same total order, no single-partition stage:
  *
  *   1. range-partitioned global sort (`orderBy` → RangePartitioning);
  *   2. per-partition `row_number` windowed on `spark_partition_id()` —
  *      every partition numbers its own rows in parallel;
  *   3. per-partition counts (a tiny #partitions-row aggregate) turned
  *      into prefix-sum offsets and broadcast-joined back.
  *
  * The only single-partition work is the prefix sum over the counts
  * frame — O(#partitions) rows, not O(data). Requires the sort key to be
  * total (add a unique tiebreaker) for a deterministic numbering.
  */
object GlobalSort {

  def withRowNumber(df: DataFrame, name: String, sortCols: Column*): DataFrame = {
    val sorted = df.orderBy(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      // One pass computes both the numbering and the counts; without the
      // barrier the two consumers would re-run the full sort.
      .localCheckpoint(true)
    val counts = sorted.groupBy(col("__pid")).count()
    val offsets = counts.withColumn("__off",
      coalesce(sum(col("count")).over(
        Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L))).select(col("__pid"), col("__off"))
    val local = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    sorted
      .withColumn("__lrn", row_number().over(local))
      .join(broadcast(offsets), "__pid")
      .withColumn(name, (col("__off") + col("__lrn")).cast("long"))
      .drop("__pid", "__lrn", "__off")
  }
}
