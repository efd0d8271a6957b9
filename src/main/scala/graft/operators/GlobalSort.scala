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

  /** The padded sketch percentages [lo_1..lo_m, hi_1..hi_m] backing
    * [[exactPercentiles]]' bracket pass — public so a STREAMING sketch
    * (st37: the same `approx_percentile` running as a Complete-mode
    * streaming aggregate) can build the identical bracket query (via
    * [[sketchAgg]]) and hand its drained stats to
    * [[selectPercentiles]]: sketch online, certify offline. */
  def bracketPercentages(qs: Seq[Double], accuracy: Int): Seq[Double] = {
    val pad = 3.0 / accuracy
    qs.map(q => math.max(q - pad, 0.0)) ++ qs.map(q => math.min(q + pad, 1.0))
  }

  /** The ONE bracket-sketch aggregation both [[exactPercentiles]] and
    * the streaming twin run over the ("v" double, no-nulls) frame:
    * (n, b) = exact count + the GK sketch at [[bracketPercentages]].
    * Shared so the "identical bracket query" contract of
    * [[selectPercentiles]] is enforced by construction, not by keeping
    * two hand-built copies in sync. */
  def sketchAgg(qs: Seq[Double], accuracy: Int): Seq[Column] = {
    import org.apache.spark.sql.functions._
    val pcts = bracketPercentages(qs, accuracy).mkString(",")
    Seq(count(lit(1)).as("n"),
      expr(s"approx_percentile(v, array($pcts), $accuracy)").as("b"))
  }

  /** EXACT global percentiles of an unbounded numeric column — without a
    * global sort of the data and without `percentile`'s exact
    * value-histogram state (which is one entry per DISTINCT value per
    * group: fine for bounded domains like token lengths, an OOM at
    * 100 TB of prices/latencies/scores). The classic two-phase
    * selection (Munro & Paterson, TCS'80, in its sketch-bracketed
    * form):
    *
    *   1. ONE pass aggregates the count n and a Greenwald-Khanna sketch
    *      (`approx_percentile`, rank error ≤ n/accuracy by contract) at
    *      q ∓ 3/accuracy — yielding per-quantile value brackets
    *      [lo, hi] that PROVABLY contain the exact rank-r element:
    *      rank(lo) ≤ (q−3/acc+1/acc)·n < r and rank(hi) ≥
    *      (q+3/acc−1/acc)·n > r. The sketch's own value is never
    *      output — only the bracket, so sketch implementation details
    *      cannot reach the result;
    *   2. one pass counts the exact rank offset below each lo;
    *   3. each bracket — ≤ ~6n/accuracy rows, a 0.06 % sliver at the
    *      default accuracy — is range-partition sorted and
    *      zipWithIndex-numbered (the [[withRowNumber]] machinery:
    *      distributed, never a single-task window); the (r − offset)-th
    *      bracket row IS the exact r-th smallest overall, duplicates
    *      and all. Each picked row collects immediately (ONE row), so
    *      the bracket's eager checkpoint blocks are freed before the
    *      operator returns — no session-lifetime block-manager leak
    *      (the [[graft.util.Caching]] discipline).
    *
    * Small inputs: the pad covers 3n/accuracy ranks, which is under the
    * ±1 rank slack between the sketch's own quantile definition and
    * r = floor(q·(n−1)) + 1 whenever n < accuracy — so below that size
    * the bracket is simply the whole domain (the "sliver" IS the data;
    * selection is still exact and still distributed).
    *
    * r = floor(q·(n−1)) + 1 (the lower discrete quantile, 1-based) —
    * spelled identically engine-side and oracle-side. The driver holds
    * one stats row, |qs| bracket constants, and the |qs| picked rows
    * (the IVF-centroid collect discipline). Output: (q, value, rank),
    * exact and engine-independent. */
  def exactPercentiles(df: DataFrame, valueCol: Column, qs: Seq[Double],
                       accuracy: Int = 10000): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantiles must be in [0, 1]")
    require(accuracy >= 100, "accuracy must be >= 100")
    import org.apache.spark.sql.functions._
    val v = df.select(valueCol.cast("double").as("v")).filter(col("v").isNotNull)
    val aggCols = sketchAgg(qs, accuracy)
    val stats = v.agg(aggCols.head, aggCols.tail: _*).head()
    selectPercentiles(v, qs, accuracy, stats.getLong(0), stats.getSeq[Double](1))
  }

  /** [[exactPercentiles]] PER GROUP — exact per-source/per-tenant
    * latency-style order statistics, as ONE lazy plan with no driver
    * iteration at all (unlike the global form's per-bracket collect):
    *
    *   - the bracket sketch runs per group (`groupBy(g)` + the same
    *     [[sketchAgg]]), and the per-(group, quantile) targets —
    *     r = floor(q·(n_g − 1)) + 1 and the [lo, hi] bracket, with the
    *     whole-domain fallback whenever n_g < accuracy — are derived
    *     COLUMNARLY from that stats frame and broadcast
    *     (|groups|·|qs| rows, the [[graft.operators.TextAnalysis.heavyHittersPerGroup]]
    *     broadcast-bound discipline: for an unbounded group domain,
    *     shard the group space);
    *   - one corpus pass joined to the broadcast targets counts the
    *     exact per-(group, quantile) offsets AND tags bracket rows;
    *   - the bracket slivers sort under a window PARTITIONED by
    *     (group, quantile) — each partition is a ≤ ~6n_g/accuracy
    *     sliver, so no single-task window on data-sized input — and
    *     the (r − offset)-th row per partition is the exact answer.
    *
    * Null groups and null values are excluded ([[TextAnalysis.heavyHittersPerGroup]]'s
    * documented contract). Output: (groupCol, q, value, rank). */
  def exactPercentilesByGroup(df: DataFrame, groupCol: String, valueCol: Column,
                              qs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantiles must be in [0, 1]")
    require(accuracy >= 100, "accuracy must be >= 100")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val v = df.select(col(groupCol).as("__g"), valueCol.cast("double").as("v"))
      .filter(col("v").isNotNull && col("__g").isNotNull)
    val aggCols = sketchAgg(qs, accuracy)
    val stats = v.groupBy(col("__g")).agg(aggCols.head, aggCols.tail: _*)
    val m = qs.size
    // one target row per (group, quantile): rank + bracket, columnar
    val targets = stats.select(col("__g"), col("n"), col("b"),
        explode(typedlit(qs.zipWithIndex)).as("qi"))
      .select(col("__g"),
        col("qi._1").as("q"),
        (floor(col("qi._1") * (col("n") - 1)).cast("long") + 1L).as("r"),
        when(col("n") < accuracy, lit(Double.NegativeInfinity))
          .otherwise(element_at(col("b"), col("qi._2") + 1)).as("lo"),
        when(col("n") < accuracy, lit(Double.PositiveInfinity))
          .otherwise(element_at(col("b"), col("qi._2") + lit(m) + 1)).as("hi"))
    val tagged = v.join(broadcast(targets), "__g")
      .withColumn("below", (col("v") < col("lo")).cast("long"))
      .withColumn("inb", col("v") >= col("lo") && col("v") <= col("hi"))
    val offs = tagged.groupBy(col("__g"), col("q"))
      .agg(sum(col("below")).as("off"))
    val w = Window.partitionBy(col("__g"), col("q")).orderBy(col("v"))
    tagged.filter(col("inb"))
      .withColumn("rn", row_number().over(w))
      .join(offs, Seq("__g", "q"))
      .filter(col("rn") === col("r") - col("off"))
      .select(col("__g").as(groupCol), col("q"), col("v").as("value"),
        col("r").as("rank"))
  }

  /** Exact INTER-DECILE mean per group — the robust location estimate
    * between [[exactPercentilesByGroup]]'s point statistics and
    * [[graft.operators.TextAnalysis.lengthOutliers]]' MAD verdicts:
    * mean of the values v with p10 ≤ v ≤ p90, where p10/p90 are the
    * exact rank-based decile VALUES (r = floor(q·(n−1)) + 1). Trimming
    * by the decile VALUE (not by dropping a count of rows) makes ties a
    * non-issue: the kept multiset is a pure function of the data, no
    * tiebreak order ever observable — and both thresholds replay in the
    * oracle as order statistics.
    *
    * Shape: the q86 machinery end-to-end (per-group sketch brackets,
    * broadcast targets, sliver-windowed selection), then ONE more
    * corpus pass against the 2-value-per-group broadcast bounds —
    * map-side-combined count/sum, integer milli output.
    *
    * CONTRACT: `valueCol` must be NON-NEGATIVE. `mean_milli` uses SQL
    * trunc division (DIV); for a negative trimmed sum trunc diverges
    * from the floor-division (//) replay convention the repo's oracles
    * use. Current caller (ext124) feeds token counts; a caller with
    * signed values must normalize first (the systematicSample weight
    * discipline) or fork the rounding rule together with its oracle. */
  def interdecileMeanByGroup(df: DataFrame, groupCol: String,
                             valueCol: Column): DataFrame = {
    import org.apache.spark.sql.functions._
    val v = df.select(col(groupCol).as("__g"), valueCol.cast("long").as("v"))
      .filter(col("v").isNotNull && col("__g").isNotNull)
    val bounds = exactPercentilesByGroup(v, "__g", col("v"), Seq(0.1, 0.9))
      .groupBy(col("__g"))
      .agg(min(when(col("q") === 0.1, col("value"))).cast("long").as("v10"),
        min(when(col("q") === 0.9, col("value"))).cast("long").as("v90"))
    v.join(broadcast(bounds), "__g")
      .groupBy(col("__g"), col("v10"), col("v90"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("v").between(col("v10"), col("v90")), 1L)
          .otherwise(0L)).as("n_kept"),
        sum(when(col("v").between(col("v10"), col("v90")), col("v")))
          .as("__s"))
      .select(col("__g").as(groupCol), col("n"), col("v10"), col("v90"),
        col("n_kept"),
        expr("CAST((1000 * __s) DIV n_kept AS BIGINT)").as("mean_milli"))
  }

  /** The exact-selection phases of [[exactPercentiles]], separable so the
    * bracket sketch can come from a stream (st37). `v` must be (a
    * re-derivation of) the single-column ("v", double, no nulls) frame
    * the sketch summarized; `n` its exact count; `br` the sketch values
    * at [[bracketPercentages]] order. The GK rank guarantee is preserved
    * by arbitrary merge trees (mergeable summaries), so a state-store
    * merged streaming sketch brackets exactly as a batch one does. */
  def selectPercentiles(v: DataFrame, qs: Seq[Double], accuracy: Int,
                        n: Long, br: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = v.sparkSession
    require(n > 0, "exactPercentiles requires at least one non-null value")
    // below n = accuracy the 3n/accuracy pad cannot absorb the ±1 rank
    // definitional slack — bracket the whole domain instead (see doc)
    val sliver = n < accuracy
    val targets = qs.zipWithIndex.map { case (q, i) =>
      val (lo, hi) = if (sliver) (Double.NegativeInfinity, Double.PositiveInfinity)
                     else (br(i), br(qs.size + i))
      (q, math.floor(q * (n - 1)).toLong + 1L, lo, hi)
    }
    val offCols = targets.zipWithIndex.map { case ((_, _, lo, _), i) =>
      sum(when(col("v") < lo, 1L).otherwise(0L)).as(s"off_$i")
    }
    val offRow = v.agg(offCols.head, offCols.tail: _*).head()
    val picked = targets.zipWithIndex.map { case ((q, r, lo, hi), i) =>
      val pick = r - offRow.getLong(i)
      // the GK contract puts the rank-r element inside [lo, hi]
      require(pick >= 1, s"bracket guarantee violated for q=$q (pick=$pick)")
      // sort + number the sliver distributed, collect the ONE picked
      // row, then free the checkpoint blocks (safe: nothing else
      // references them once the row is on the driver)
      val sorted = v.filter(col("v") >= lo && col("v") <= hi)
        .orderBy(col("v")).localCheckpoint(true)
      try {
        val row = sorted.rdd.zipWithIndex()
          .filter { case (_, idx) => idx == pick - 1 }
          .map { case (rw, _) => rw.getDouble(0) }
          .collect()
        require(row.length == 1,
          s"bracket guarantee violated for q=$q (pick=$pick, bracket hit ${row.length})")
        Row(q, row.head, r)
      } finally graft.util.Caching.freeCheckpoint(sorted)
    }
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    spark.createDataFrame(picked.asJava,
      StructType(Seq(StructField("q", DoubleType, nullable = false),
        StructField("value", DoubleType, nullable = false),
        StructField("rank", LongType, nullable = false))))
  }

}
