package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min frequency sketch (Cormode & Muthukrishnan, J. Algorithms
  * 2005) as a PURE RELATIONAL plan — the point-frequency complement of
  * the Misra-Gries census ([[TextAnalysis.heavyHitters]]): MG answers
  * "which items are heavy", CMS answers "how often does THIS item
  * occur" for any probe item, from d·w counters regardless of the item
  * domain (URLs, n-grams, session ids at 100 TB, where one counter per
  * distinct item is a job-killer).
  *
  * The sketch here is not a custom aggregation buffer but a TABLE:
  * each item contributes one row per hash row r ∈ [0, d), keyed
  * (r, bucket_r(item)), and the sketch is `groupBy(r, bucket).count` —
  * ≤ d·w rows total. That formulation buys, for free, exactly the
  * properties a 100 TB sketch needs:
  *
  *   - map-side combine: the shuffle carries ≤ d·w rows per map task,
  *     never the item stream;
  *   - mergeability BY CONSTRUCTION: CMS of a union = cell-wise sum =
  *     what a count aggregation already does across partitions (and
  *     across micro-batches in a Complete-mode streaming aggregate —
  *     the st38 form — state bounded at d·w rows forever);
  *   - engine-independence: the bucket hash is the md5 32-bit-prefix
  *     recipe every oracle replays ([[Sampling.split]] discipline), so
  *     estimates are deterministic VALUES, not rows-only sketch output.
  *
  * Estimate guarantee (deterministic, not probabilistic): est(x) =
  * min_r cnt[r][bucket_r(x)] ≥ true(x) always — buckets only ever
  * overcount, and the property survives merges. The probabilistic part
  * is only the tightness: P[est − true > 2n/w] < (1/2)^d for pairwise-
  * independent hashes; the md5-derived family is not formally pairwise
  * independent, which moves the constant, not the ≥ guarantee that the
  * spec pins. Overcount expectation is n/w per row — size w to the
  * tolerable absolute error at the target n, d to the confidence
  * (d=4, w=2048 → 8 KiB of longs; even w=2^20 is executor-trivial).
  */
object CountMin {

  /** Row-r bucket of an item: the engine-replayable md5 32-bit prefix
    * of "cm{r}:item", mod w. DuckDB replays it as
    * `('0x' || substr(md5('cm' || r || ':' || item), 1, 8))::BIGINT % w`. */
  def bucket(item: Column, r: Int, w: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"cm$r:"), item)), 1, 8), 16, 10)
      .cast("long"), lit(w.toLong))

  /** One (r, bucket) row per hash row per non-null item — the narrow,
    * shuffle-free explode both the batch and streaming sketch builds
    * aggregate. d is a plan-time constant, so the whole projection is
    * codegen'd (no UDF, no object boundary). */
  def bucketRows(items: DataFrame, itemCol: Column, d: Int, w: Int): DataFrame = {
    require(d > 0 && w > 0, "d and w must be positive")
    items.select(itemCol.as("item")).filter(col("item").isNotNull)
      .select(explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), bucket(col("item"), r, w).as("bucket"))): _*))
        .as("rb"))
      .select(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
  }

  /** The sketch itself: a ≤ d·w-row (r, bucket, cnt) table. Absent
    * cells are zero by omission (the estimate side coalesces). */
  def sketch(items: DataFrame, itemCol: Column, d: Int, w: Int): DataFrame =
    bucketRows(items, itemCol, d, w)
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates for a probe set against a prebuilt sketch frame
    * (batch-built, streamed-and-drained, or loaded from a table): the
    * probe's d cells meet the BROADCAST sketch in an equality join —
    * the probe stream never shuffles and the corpus is never touched.
    * Missing cells read 0 (an absent bucket means no item hashed
    * there). Output: (item, est). */
  def estimateWith(sketchDf: DataFrame, probes: DataFrame, probeCol: Column,
                   d: Int, w: Int): DataFrame = {
    val p = probes.select(probeCol.as("item"))
      .filter(col("item").isNotNull).distinct()
    // like bucketRows, but the explode carries the probe item through
    val cells = p.select(col("item"), explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), bucket(col("item"), r, w).as("bucket"))): _*))
        .as("rb"))
      .select(col("item"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
    cells.join(broadcast(sketchDf), Seq("r", "bucket"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Estimate-and-certify against a PREBUILT sketch frame (the seam the
    * streaming twin st38 drains its Complete-mode sketch through — the
    * st36/st37 "sketch online, certify offline" discipline): CMS point
    * estimates for the probe set next to the EXACT count of each probe
    * (one corpus scan restricted to the broadcast probe set — the
    * [[TextAnalysis.heavyHittersRecount]] discipline) and the overcount
    * est − cnt, which the CMS ≥ guarantee makes provably non-negative.
    * Output: (item, est, cnt, overcount), overcount = est − cnt ≥ 0. */
  def certifyWith(sketchDf: DataFrame, items: DataFrame, itemCol: Column,
                  probes: DataFrame, probeCol: Column,
                  d: Int, w: Int): DataFrame = {
    val est = estimateWith(sketchDf, probes, probeCol, d, w)
    val it = items.select(itemCol.as("item")).filter(col("item").isNotNull)
    val exact = it.join(broadcast(est.select(col("item"))), "item")
      .groupBy(col("item")).agg(count(lit(1)).as("cnt"))
    est.join(exact, Seq("item"), "left")
      .select(col("item"), col("est"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        (col("est") - coalesce(col("cnt"), lit(0L))).as("overcount"))
  }

  /** [[certifyWith]] over a batch-built sketch. Two narrow corpus scans
    * total (one for the sketch, one for the certification); the
    * production path that keeps only the sketch is [[sketch]] +
    * [[estimateWith]]. */
  def estimates(items: DataFrame, itemCol: Column, probes: DataFrame,
                probeCol: Column, d: Int, w: Int): DataFrame =
    certifyWith(sketch(items, itemCol, d, w), items, itemCol,
      probes, probeCol, d, w)

  /** WEIGHTED [[sketch]]: cells sum a positive long weight (bytes,
    * cents, tokens) instead of counting occurrences — answering "how
    * much TOTAL weight does this item carry" from d·w counters, the
    * point-query complement of the weighted Misra-Gries census
    * ([[TextAnalysis.weightedHeavyHitters]]). Positive weights keep the
    * ≥ guarantee: cells only ever overcount, so min-over-rows ≥ the
    * item's true weight sum, deterministically. Zero/negative/null
    * weights and null items are excluded (the ext102 fixed-point
    * discipline: pre-scale money/bytes to integer units). The cell
    * column is named `cnt` so [[estimateWith]] serves both sketches. */
  def sketchWeighted(items: DataFrame, itemCol: Column, weightCol: Column,
                     d: Int, w: Int): DataFrame = {
    require(d > 0 && w > 0, "d and w must be positive")
    items.select(itemCol.as("item"), weightCol.as("wt"))
      .filter(col("item").isNotNull && col("wt").isNotNull && col("wt") > 0)
      .select(col("wt"), explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), bucket(col("item"), r, w).as("bucket"))): _*))
        .as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(sum(col("wt")).as("cnt"))
  }

  /** Weighted estimate-and-certify: [[sketchWeighted]] +
    * [[estimateWith]] + one exact re-sum over the broadcast probe set.
    * Output: (item, est_w, w_sum, overcount), overcount ≥ 0. */
  def estimatesWeighted(items: DataFrame, itemCol: Column,
                        weightCol: Column, probes: DataFrame,
                        probeCol: Column, d: Int, w: Int): DataFrame = {
    val sk = sketchWeighted(items, itemCol, weightCol, d, w)
    val est = estimateWith(sk, probes, probeCol, d, w)
      .withColumnRenamed("est", "est_w")
    val it = items.select(itemCol.as("item"), weightCol.as("wt"))
      .filter(col("item").isNotNull && col("wt").isNotNull && col("wt") > 0)
    val exact = it.join(broadcast(est.select(col("item"))), "item")
      .groupBy(col("item")).agg(sum(col("wt")).as("w_sum"))
    est.join(exact, Seq("item"), "left")
      .select(col("item"), col("est_w"),
        coalesce(col("w_sum"), lit(0L)).as("w_sum"),
        (col("est_w") - coalesce(col("w_sum"), lit(0L))).as("overcount"))
  }
}
