package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-bucketed band join — the scale-safe plan for PURE range
  * predicates (`lo <= v AND v <= hi` with no equality key).
  *
  * Spark plans an equality-free range join as BroadcastNestedLoopJoin
  * (or a cartesian product when neither side broadcasts): O(|points| ×
  * |intervals|) comparisons, the canonical 100 TB scale-killer — fine
  * for a KB-sized dimension, dead the day the interval side outgrows a
  * broadcast. The relational fix (the "range bucketing" behind the
  * range-join hints of lakehouse engines, and the interval-join
  * strategy of stream processors): overlay a grid of width `bucket`,
  * explode each interval onto the grid cells it intersects, map each
  * point to its one cell, and equi-join on the cell id.
  *
  * Exactness: floor is monotone, so lo <= v <= hi implies
  * floor(lo/W) <= floor(v/W) <= floor(hi/W) — a qualifying pair always
  * meets in the point's cell, REGARDLESS of floating-point fuzz in the
  * division (the exact predicate re-checked after the join decides
  * membership; bucketing only routes). Each pair meets in exactly ONE
  * cell (the point has one cell), so no dedup pass is needed.
  *
  * Scale shape: one shuffle keyed by cell id on each side; replication
  * only on the interval side, factor 1 + ceil(len/W) — pick `bucket`
  * near the typical interval length so that factor is ~2. Skewed cells
  * (many intervals stacking on one hot range) are ordinary hash-join
  * skew, which AQE's skew-join split handles — unlike a nested loop,
  * which has no skew story at all. */
object RangeJoin {

  /** Inner-join `points` (value `pointCol`) to `intervals`
    * ([`loCol`, `hiCol`], both inclusive) via grid cells of width
    * `bucket`. Intervals with lo > hi match nothing (dropped by the
    * cell enumeration guard, same as the exact predicate). Output:
    * all columns of both inputs. */
  def bandJoin(points: DataFrame, intervals: DataFrame,
               pointCol: String, loCol: String, hiCol: String,
               bucket: Double): DataFrame = {
    require(bucket > 0, "bucket width must be positive")
    val cellOf = (c: Column) => floor(c / lit(bucket)).cast("long")
    val iv = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__cell", explode(sequence(cellOf(col(loCol)), cellOf(col(hiCol)))))
    val pt = points.withColumn("__cell", cellOf(col(pointCol)))
    pt.join(iv, "__cell")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__cell")
  }
}
